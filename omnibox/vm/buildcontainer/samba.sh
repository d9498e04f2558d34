#!/usr/bin/env bash
# Guest-visible samba shares on host.lan: the setup bundle the firstboot
# script pulls (\\host.lan\data -> /omnibox/setup + /omnibox/guest) and a
# scratch share for host<->guest file exchange (\\host.lan\shared).
#
# Parity surface: /root/reference/omnitool/omnibox/vm/buildcontainer/
# samba.sh (guest-readable setup share on the NAT bridge); implementation
# is our own minimal smbd config.
set -Eeuo pipefail

: "${SAMBA:="Y"}"
[[ "${SAMBA}" == [Nn]* ]] && return 0

SMB_CONF="/etc/samba/smb.conf"
mkdir -p /shared /omnibox/setup /omnibox/guest

cat > "${SMB_CONF}" <<EOF
[global]
   server string = OmniBox host share
   map to guest = Bad User
   guest account = nobody
   security = user
   server min protocol = NT1
   interfaces = ${VM_NET_DEV:-dockerbridge}
   bind interfaces only = yes
   log level = 0

[data]
   comment = OmniBox guest setup bundle (read-only)
   path = /omnibox
   browseable = yes
   guest ok = yes
   read only = yes

[shared]
   comment = host<->guest scratch
   path = /shared
   browseable = yes
   guest ok = yes
   read only = no
   force user = nobody
EOF
chmod 777 /shared

smbd --configfile="${SMB_CONF}" --daemon || error "smbd failed to start"
wsdd -i "${VM_NET_DEV:-dockerbridge}" >/dev/null 2>&1 &

return 0
