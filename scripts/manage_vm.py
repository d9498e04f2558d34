"""Mock OmniBox lifecycle CLI (verb parity with the reference's
omnitool/omnibox/scripts/manage_vm.sh create|start|stop|delete).

The real Docker/QEMU Windows VM is host infrastructure outside TPU scope
(SURVEY.md §2.4); anything answering /probe /execute /screenshot on the
chosen port substitutes for it.  This runs the in-repo mock in the
foreground:

    python scripts/manage_vm.py start --port 5000
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser("mock omnibox")
    ap.add_argument("verb", choices=["create", "start", "stop", "delete"])
    ap.add_argument("--port", type=int, default=5000)
    args = ap.parse_args()

    if args.verb in ("stop", "delete"):
        print(f"{args.verb}: the mock VM is a foreground process — Ctrl-C it. "
              "(No persistent state to delete.)")
        return
    from omniparser_tpu.agent.mock_vm import MockVM
    from omniparser_tpu.utils.health import probe_poll

    vm = MockVM()
    url = vm.start(port=args.port)
    ok = probe_poll(f"{url}/probe", timeout_s=10)
    print(f"VM + server is up and running! {url}  (probe: {ok})")
    try:
        while True:
            time.sleep(3600)
    except KeyboardInterrupt:
        vm.stop()


if __name__ == "__main__":
    main()
