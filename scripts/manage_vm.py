"""OmniBox lifecycle CLI (verb parity with the reference's
omnitool/omnibox/scripts/manage_vm.sh create|start|stop|delete).

Backends:
  docker — build + run the real Windows VM container (omnibox/Dockerfile,
           omnibox/compose.yml) and poll the guest control server's /probe
           until it answers, exactly like the reference manage_vm.sh:3-50.
           Requires docker + /dev/kvm on the host.
  mock   — run the in-repo contract-exact fake guest (agent/mock_vm.py) in
           the foreground; what CI and TPU-only hosts use.
  guest  — run the REAL guest control server (omnibox/guest/server.py)
           locally — useful on any machine that should act as the sandbox
           (a spare desktop with pyautogui) without the VM wrapper.

Default is mock when docker is unavailable, docker otherwise.
"""

import argparse
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
COMPOSE = os.path.join(REPO, "omnibox", "compose.yml")


def _compose(*verb: str) -> int:
    return subprocess.call(["docker", "compose", "-f", COMPOSE, *verb])


def _poll_probe(url: str, timeout_s: float = 1800) -> bool:
    from omniparser_tpu.utils.health import probe_poll

    t0 = time.time()
    while time.time() - t0 < timeout_s:
        if probe_poll(url, timeout_s=5):
            return True
        print("Waiting for the computer control server (first boot can take "
              "a while: unattended Windows install)...")
        time.sleep(5)
    return False


def docker_backend(verb: str, port: int) -> int:
    probe = f"http://localhost:{port}/probe"
    if verb == "create":
        img = subprocess.run(["docker", "images", "-q", "omnibox-local"],
                             capture_output=True, text=True).stdout.strip()
        if not img:
            print("Image not found locally. Building...")
            rc = subprocess.call(
                ["docker", "build", "-t", "omnibox-local",
                 os.path.join(REPO, "omnibox")])
            if rc:
                return rc
        else:
            print("Image found locally. Skipping build.")
        rc = _compose("up", "-d")
        if rc:
            return rc
        ok = _poll_probe(probe)
        print("VM + server is up and running!" if ok
              else "Timed out waiting for the control server.")
        return 0 if ok else 1
    if verb == "start":
        rc = _compose("start")
        if rc:
            return rc
        ok = _poll_probe(probe)
        print("VM started" if ok else "Timed out waiting for the control server.")
        return 0 if ok else 1
    if verb == "stop":
        rc = _compose("stop")
        print("VM stopped")
        return rc
    if verb == "delete":
        rc = _compose("down")
        print("VM removed")
        return rc
    raise AssertionError(verb)


def foreground(server_start, port: int) -> int:
    from omniparser_tpu.utils.health import probe_poll

    url = server_start(port)
    ok = probe_poll(f"{url}/probe", timeout_s=10)
    print(f"VM + server is up and running! {url}  (probe: {ok})")
    try:
        while True:
            time.sleep(3600)
    except KeyboardInterrupt:
        return 0


def main():
    ap = argparse.ArgumentParser("omnibox lifecycle")
    ap.add_argument("verb", choices=["create", "start", "stop", "delete"])
    ap.add_argument("--port", type=int, default=5000)
    ap.add_argument("--backend", choices=["docker", "mock", "guest"],
                    default="docker" if shutil.which("docker") else "mock")
    ap.add_argument("--allow-exec", action="store_true",
                    help="guest backend: allow arbitrary /execute commands")
    args = ap.parse_args()

    if args.backend == "docker":
        sys.exit(docker_backend(args.verb, args.port))

    if args.verb in ("stop", "delete"):
        print(f"{args.verb}: the {args.backend} server is a foreground "
              "process — Ctrl-C it. (No persistent state to delete.)")
        return

    if args.backend == "mock":
        from omniparser_tpu.agent.mock_vm import MockVM

        vm = MockVM()
        sys.exit(foreground(lambda p: vm.start(port=p), args.port))
    else:  # guest: the real control server, in-process
        sys.path.insert(0, os.path.join(REPO, "omnibox", "guest"))
        import server as guest_server

        agent = guest_server.GuestAgent(allow_exec=args.allow_exec)

        def start(p):
            guest_server.serve("127.0.0.1", p, agent)
            return f"http://127.0.0.1:{p}"

        sys.exit(foreground(start, args.port))


if __name__ == "__main__":
    main()
