# Data-driven guest app provisioning: one generic loop over
# tools_config.json instead of one hand-written block per app (first-party
# equivalent of the reference's
# omnitool/omnibox/vm/win11setup/setupscripts/setup.ps1:350-391 +
# setup-tools.psm1; plan semantics mirrored + unit-tested host-side in
# provision.py / tests/test_provision.py).
#
# Usage:  .\install_tools.ps1 [-ConfigPath tools_config.json] [-Only name,name]

param(
    [string]$ConfigPath = "$PSScriptRoot\tools_config.json",
    [string[]]$Only = @()
)

$ErrorActionPreference = "Continue"
$ProgressPreference = "SilentlyContinue"  # 10x faster Invoke-WebRequest

function Expand-WinEnv([string]$p) {
    return [Environment]::ExpandEnvironmentVariables($p)
}

function Get-FromMirrors([string[]]$mirrors, [string]$outfile) {
    # mirror fallback + per-mirror retry with exponential backoff
    foreach ($url in $mirrors) {
        $sleep = 2
        for ($try = 1; $try -le 3; $try++) {
            try {
                Invoke-WebRequest -Uri $url -OutFile $outfile -UseBasicParsing `
                    -Headers @{ "User-Agent" = "Mozilla/5.0 (Windows NT 10.0; Win64; x64)" }
                Write-Output "[tools] downloaded $url"
                return $true
            } catch {
                Write-Output "[tools] attempt $try failed for ${url}: $($_.Exception.Message)"
                Start-Sleep -Seconds $sleep
                $sleep = [Math]::Min($sleep * 2, 10)
            }
        }
    }
    return $false
}

function Add-MachinePath([string]$dir) {
    $cur = [Environment]::GetEnvironmentVariable("PATH", "Machine")
    if ($cur -notlike "*$dir*") {
        [Environment]::SetEnvironmentVariable("PATH", "$cur;$dir", "Machine")
        $env:PATH += ";$dir"
    }
}

$cfg = Get-Content $ConfigPath -Raw | ConvertFrom-Json
if ($cfg.schema -ne 1) { throw "unsupported tools_config schema $($cfg.schema)" }
$root = Expand-WinEnv $cfg.install_root
New-Item -ItemType Directory -Force -Path $root | Out-Null

# dependency-ordered pass: requires entries always precede dependents in
# the catalog file; a second sweep catches forward references
$names = $cfg.tools.PSObject.Properties.Name
if ($Only.Count -gt 0) { $names = $names | Where-Object { $Only -contains $_ } }

foreach ($name in $names) {
    $spec = $cfg.tools.$name
    $exe = Expand-WinEnv $spec.exe
    if (Test-Path $exe) {
        Write-Output "[tools] $name already installed ($exe)"
        continue
    }
    $dl = Join-Path $root "$name-installer"
    if (-not (Get-FromMirrors -mirrors $spec.mirrors -outfile $dl)) {
        Write-Output "[tools] SKIP $name - every mirror failed"
        continue
    }
    if ($spec.sha256) {
        $got = (Get-FileHash -Algorithm SHA256 -Path $dl).Hash.ToLower()
        if ($got -ne $spec.sha256.ToLower()) {
            Write-Output "[tools] SKIP $name - sha256 mismatch ($got)"
            Remove-Item $dl; continue
        }
    }
    try {
        if ($spec.raw_copy) {
            $dest = Expand-WinEnv $spec.raw_copy
            New-Item -ItemType Directory -Force -Path (Split-Path $dest) | Out-Null
            Move-Item -Force $dl $dest
        } elseif ($spec.archive) {
            $dest = Expand-WinEnv $spec.archive.dest
            New-Item -ItemType Directory -Force -Path $dest | Out-Null
            & "C:\Program Files\7-Zip\7z.exe" x $dl "-o$dest" -y | Out-Null
            Remove-Item $dl
        } elseif ($spec.msi) {
            Start-Process msiexec -ArgumentList (@("/i", $dl) + $spec.args) -Wait -Verb RunAs
            Remove-Item $dl
        } else {
            Move-Item -Force $dl "$dl.exe"
            Start-Process "$dl.exe" -ArgumentList $spec.args -Wait -Verb RunAs
            Remove-Item "$dl.exe"
        }
        if ($spec.alias) {
            Add-Content -Path $PROFILE -Value "Set-Alias -Name $($spec.alias) -Value `"$exe`""
        }
        if ($spec.path_add) { Add-MachinePath (Expand-WinEnv $spec.path_add) }
        if ($spec.post -and $spec.post.vscode_disable_autoupdate) {
            $s = "$env:APPDATA\Code\User\settings.json"
            New-Item -ItemType Directory -Force -Path (Split-Path $s) | Out-Null
            $obj = if (Test-Path $s) { Get-Content $s | ConvertFrom-Json } else { @{} }
            $obj | Add-Member -NotePropertyName "update.mode" -NotePropertyValue "none" -Force
            $obj | ConvertTo-Json | Set-Content $s
        }
        Write-Output "[tools] installed $name"
    } catch {
        Write-Output "[tools] FAILED $name : $($_.Exception.Message)"
    }
}
