@echo off
rem OmniBox guest firstboot hook.  The unattended Windows install copies the
rem OEM volume into the guest and runs this on first logon; it hands off to
rem setup.ps1 next to it and logs to the host-visible samba share
rem (reference analogue: omnitool/omnibox/vm/win11setup/firstboot/install.bat).
set LOG=\\host.lan\data\firstboot.log

echo [%date% %time%] firstboot starting > %LOG% 2>&1
powershell -ExecutionPolicy Bypass -NoProfile -File "%~dp0setup.ps1" >> %LOG% 2>&1
echo [%date% %time%] firstboot done (exit %errorlevel%) >> %LOG% 2>&1
