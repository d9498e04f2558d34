#!/usr/bin/env bash
# Graceful VM power handling: forward container SIGTERM as an ACPI
# powerdown so Windows shuts down cleanly (no dirty NTFS on docker stop),
# with a bounded wait before QEMU is killed.
#
# Parity surface: /root/reference/omnitool/omnibox/vm/buildcontainer/
# power.sh (ACPI forwarding + shutdown grace); ours keeps the monitor
# plumbing from the base image and adds only the OmniBox policy.
set -Eeuo pipefail

: "${GRACE_SECONDS:="120"}"

_monitor_cmd() {
  # the base image exposes the QEMU human monitor on a local socket
  echo "$1" | nc -q 1 -U "${QEMU_MONITOR:-/run/qemu.sock}" >/dev/null 2>&1 || :
}

_graceful_shutdown() {
  info "SIGTERM: sending ACPI powerdown to the guest (grace ${GRACE_SECONDS}s)"
  _monitor_cmd "system_powerdown"
  local waited=0
  while [ ! -f "${QEMU_END:-/run/qemu.end}" ] && (( waited < GRACE_SECONDS )); do
    sleep 2; waited=$((waited + 2))
  done
  if [ ! -f "${QEMU_END:-/run/qemu.end}" ]; then
    error "guest did not power down within ${GRACE_SECONDS}s; quitting QEMU"
    _monitor_cmd "quit"
  fi
  exit 0
}

trap _graceful_shutdown SIGTERM SIGINT

return 0
