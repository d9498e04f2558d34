# OmniBox guest bootstrap (runs once, elevated, from firstboot install.bat).
#
# First-party equivalent of the reference's setup.ps1
# (omnitool/omnibox/vm/win11setup/setupscripts/setup.ps1): install Python +
# the input-control dependency, provision the app catalog the agent
# operates on (install_tools.ps1 + tools_config.json — the data-driven
# version of the reference's per-app blocks at setup.ps1:350-391), open
# the control-server port, and register the server to start on every
# logon.  Extend the catalog by editing tools_config.json (schema +
# mock-run tested in tests/test_provision.py).

$ErrorActionPreference = "Stop"
$Share   = "\\host.lan\data"          # samba share from the container
$Root    = "C:\omnibox"
$Python  = "$env:LOCALAPPDATA\Programs\Python\Python310\python.exe"

Write-Output "[setup] staging guest payload to $Root"
New-Item -ItemType Directory -Force -Path $Root | Out-Null
Copy-Item -Recurse -Force "$Share\*" $Root

# --- Python 3.10 (winget on Win11; falls back to the bundled installer) ---
if (-not (Test-Path $Python)) {
    Write-Output "[setup] installing Python 3.10"
    try {
        winget install --id Python.Python.3.10 -e --silent `
            --accept-package-agreements --accept-source-agreements
    } catch {
        $exe = "$Root\python-installer.exe"
        Invoke-WebRequest -Uri `
            "https://www.python.org/ftp/python/3.10.11/python-3.10.11-amd64.exe" `
            -OutFile $exe
        Start-Process $exe -ArgumentList "/quiet InstallAllUsers=0 PrependPath=1" -Wait
    }
}

Write-Output "[setup] installing guest python deps (pyautogui + pillow)"
& $Python -m pip install --quiet pyautogui pillow

# --- app catalog: browsers/office/media the agent operates on ---
# (tools_config.json-driven; reference installs ~the same set via
# setup.ps1:350-391.  Failures are per-app and non-fatal — a guest
# without GIMP still serves.)
Write-Output "[setup] provisioning app catalog"
& "$Root\install_tools.ps1" -ConfigPath "$Root\tools_config.json"

# --- firewall: allow the control server port in ---
Write-Output "[setup] opening TCP 5000"
New-NetFirewallRule -DisplayName "OmniBox control server" `
    -Direction Inbound -Action Allow -Protocol TCP -LocalPort 5000 `
    -ErrorAction SilentlyContinue | Out-Null

# --- start the control server on every logon (reference on-logon.ps1) ---
Write-Output "[setup] registering logon task"
$action  = New-ScheduledTaskAction -Execute $Python `
    -Argument "$Root\server.py --host 0.0.0.0 --port 5000"
$trigger = New-ScheduledTaskTrigger -AtLogOn
Register-ScheduledTask -TaskName "OmniBoxControlServer" `
    -Action $action -Trigger $trigger -RunLevel Highest -Force | Out-Null

# --- start it now so create() can probe without a reboot ---
Start-ScheduledTask -TaskName "OmniBoxControlServer"
Write-Output "[setup] done"
