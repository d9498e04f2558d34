# Logon hook: (re)start the control server if the scheduled task is not
# running (reference analogue: on-logon.ps1:1-7).  Registered by setup.ps1;
# kept as a standalone script so images built without task-scheduler access
# can call it from the Startup folder instead.
$task = Get-ScheduledTask -TaskName "OmniBoxControlServer" -ErrorAction SilentlyContinue
if ($task -and $task.State -ne "Running") {
    Start-ScheduledTask -TaskName "OmniBoxControlServer"
} elseif (-not $task) {
    $Python = "$env:LOCALAPPDATA\Programs\Python\Python310\python.exe"
    Start-Process $Python -ArgumentList "C:\omnibox\server.py --host 0.0.0.0 --port 5000"
}
