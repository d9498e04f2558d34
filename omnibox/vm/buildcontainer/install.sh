#!/usr/bin/env bash
# Fetch the Windows evaluation ISO once and remaster it for unattended
# install: inject the answer file + the OmniBox OEM payload so setup runs
# hands-off and first logon chains into the guest bundle.
#
# First-party, focused replacement for the reference's 1,000-line
# install.sh (parity surface: /root/reference/omnitool/omnibox/vm/
# buildcontainer/install.sh — ISO fetch, autounattend injection, OEM
# folder).  Idempotent: a previously remastered ISO in /storage is reused.
set -Eeuo pipefail

: "${STORAGE:="/storage"}"
: "${ISO_CACHE:="${STORAGE}/${VERSION}.iso"}"
REMASTERED="${STORAGE}/${VERSION}-unattended.iso"
EXTRACT_DIR="/tmp/omnibox-iso"

[ -f "${REMASTERED}" ] && { export BOOT="${REMASTERED}"; return 0; }
mkdir -p "${STORAGE}"

# 1) fetch (resumable) — evaluation ISOs are public downloads
if [ ! -f "${ISO_CACHE}" ]; then
  info "Downloading ${VERSION} evaluation ISO..."
  curl -fL --retry 3 -C - -o "${ISO_CACHE}.part" "${ISO_URL}"
  mv "${ISO_CACHE}.part" "${ISO_CACHE}"
fi

# 2) unpack the ISO filesystem
rm -rf "${EXTRACT_DIR}"
mkdir -p "${EXTRACT_DIR}"
bsdtar -xf "${ISO_CACHE}" -C "${EXTRACT_DIR}"
chmod -R +w "${EXTRACT_DIR}"

# 3) answer file at the ISO root; Windows setup picks up
#    autounattend.xml automatically on boot media
cp "${XML_FILE}" "${EXTRACT_DIR}/autounattend.xml"

# 4) OEM payload: first-logon hook (answer file runs C:\OEM\install.bat)
#    Setup copies sources/$OEM$/$1 to C:\ during apply.
OEM_DIR="${EXTRACT_DIR}/sources/\$OEM\$/\$1/OEM"
mkdir -p "${OEM_DIR}"
cp /omnibox/setup/install.bat "${OEM_DIR}/install.bat"

# 5) rebuild a UEFI-bootable ISO
info "Remastering unattended ISO..."
genisoimage -quiet -no-emul-boot -iso-level 4 -udf -J -joliet-long -relaxed-filenames \
  -b boot/etfsboot.com -boot-load-size 8 \
  -eltorito-alt-boot -eltorito-platform efi \
  -b efi/microsoft/boot/efisys_noprompt.bin \
  -o "${REMASTERED}" "${EXTRACT_DIR}"
rm -rf "${EXTRACT_DIR}"

export BOOT="${REMASTERED}"
return 0
