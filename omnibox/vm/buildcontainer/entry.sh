#!/usr/bin/env bash
# OmniBox container entrypoint: assemble the unattended Windows install,
# wire the guest shares, and boot QEMU.
#
# First-party equivalent of the reference boot chain
# (/root/reference/omnitool/omnibox/vm/buildcontainer/entry.sh:12-23): the
# qemux/qemu-docker base image provides the generic QEMU plumbing in /run
# (reset/disk/display/network/boot/proc/config); this entrypoint layers
# the OmniBox-specific stages on top — edition pinning (define.sh), ISO
# fetch + answer-file injection (install.sh), guest-visible samba shares
# (samba.sh) and graceful power handling (power.sh) — then launches the
# emulator and tails its console.
set -Eeuo pipefail

: "${BOOT_MODE:="windows"}"
APP="OmniBox (omniparser_tpu sandbox VM)"
SUPPORT="file:///root/repo/omnibox/README"

cd /run

. reset.sh      # base: clean state, tmpfiles, env normalization
. define.sh     # ours: resolve VERSION -> ISO url/checksum/answer file
. install.sh    # ours: fetch ISO once, remaster with unattend + OEM
. disk.sh       # base: allocate/attach the qcow2 system disk
. display.sh    # base: VNC/NoVNC display on :8006
. network.sh    # base: user-mode NAT + port forwards (3389, 5000)
. samba.sh      # ours: host.lan shares (data= setup bundle, oem= firstboot)
. boot.sh       # base: UEFI/OVMF boot configuration
. proc.sh       # base: CPU/KVM feature flags
. power.sh      # ours: ACPI-powerdown on SIGTERM, boot watchdog
. config.sh     # base: final QEMU argument assembly

trap - ERR

info "Booting ${APP} with QEMU $(qemu-system-x86_64 --version | head -n1)"
{ qemu-system-x86_64 ${ARGS:+ $ARGS} >"$QEMU_OUT" 2>"$QEMU_LOG"; rc=$?; } || :
(( rc != 0 )) && error "$(<"$QEMU_LOG")" && exit 15

terminal                                  # base: attach the serial console
( sleep 30; boot ) &                      # base: complete boot bookkeeping
tail -fn +0 "$QEMU_LOG" 2>/dev/null &
cat "$QEMU_TERM" 2>/dev/null | tee "$QEMU_PTY" &
wait $! || :

sleep 1 & wait $!
[ ! -f "$QEMU_END" ] && finish 0
