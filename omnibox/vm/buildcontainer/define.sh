#!/usr/bin/env bash
# Resolve the requested Windows edition to a concrete ISO + answer file.
#
# The reference's define.sh is a 400-line alias matrix over every Windows
# edition qemu-docker supports; OmniBox only ever boots the evaluation
# editions that install license-free, so this table is deliberately small
# (parity surface: /root/reference/omnitool/omnibox/vm/buildcontainer/
# define.sh:23-33 — the win11e alias the Dockerfile pins).
set -Eeuo pipefail

: "${VERSION:="win11e"}"

# normalize aliases (lowercase, strip quotes/spaces)
VERSION="${VERSION//\"/}"
VERSION="${VERSION,,}"
VERSION="${VERSION// /}"

case "${VERSION}" in
  "11e" | "win11e" | "windows11e" | "win11x64-enterprise-eval")
    VERSION="win11x64-enterprise-eval"
    DETECTED="win11x64-enterprise-eval"
    ISO_URL="https://software-static.download.prss.microsoft.com/dbazure/888969d5-f34g-4e03-ac9d-1f9786c66749/22631.2861.231204-0538.23H2_NI_RELEASE_SVC_REFRESH_CLIENTENTERPRISEEVAL_OEMRET_x64FRE_en-us.iso"
    ;;
  "10e" | "win10e" | "windows10e" | "win10x64-enterprise-eval")
    VERSION="win10x64-enterprise-eval"
    DETECTED="win10x64-enterprise-eval"
    ISO_URL="https://software-static.download.prss.microsoft.com/dbazure/988969d5-f34g-4e03-ac9d-1f9786c66749/19045.2006.220908-0225.22h2_release_svc_refresh_CLIENTENTERPRISEEVAL_OEMRET_x64FRE_en-us.iso"
    ;;
  *)
    error "OmniBox supports the evaluation editions only (win11e/win10e); got VERSION=${VERSION}" && exit 64
    ;;
esac

# the unattend file install.sh injects into the remastered ISO
XML_DIR="/omnibox/vm/win11def"
XML_FILE="${XML_DIR}/${VERSION}.xml"
[ -f "${XML_FILE}" ] || { error "missing answer file ${XML_FILE}"; exit 65; }

export VERSION DETECTED ISO_URL XML_FILE
return 0
