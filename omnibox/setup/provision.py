"""Guest app provisioning: tools_config.json -> validated install plan.

First-party equivalent of the reference's app-provisioning layer
(omnitool/omnibox/vm/win11setup/setupscripts/setup.ps1:350-391 plus
setup-tools.psm1): the reference hand-writes one PowerShell block per app
(~20 apps, 391 lines); here a single data-driven loop consumes a catalog.

Split of responsibilities:
  * this module  — host/CI side: schema validation, dependency-ordered
    plan construction, and a mock executor so the provisioning logic is
    unit-testable without a Windows VM (tests/test_provision.py);
  * install_tools.ps1 — guest side: the same plan semantics in PowerShell
    (mirror fallback + retry/backoff download, silent install, alias,
    PATH), run by setup.ps1 during firstboot.

Catalog schema (tools_config.json):
  {"schema": 1, "install_root": str, "tools": {name: spec}}
  spec:
    mirrors   [str, >=1]  download URLs, tried in order
    exe       str         install marker; skip when it already exists
    args      [str]       silent-installer arguments (absent for raw_copy)
    msi       bool        run via msiexec /i
    archive   {kind,dest} extract instead of execute (e.g. ffmpeg 7z)
    raw_copy  str         download IS the tool; copy to this path
    alias     str         PowerShell profile alias
    path_add  str         directory appended to the machine PATH
    sha256    str         optional integrity pin for the download
    requires  [str]       catalog names that must install first
    post      {..}        named post-install tweaks (e.g. vscode settings)
"""

from __future__ import annotations

import json
import os
from typing import Callable, Dict, List, Optional

_STR_LIST = ("mirrors", "args", "requires")
_STR_FIELDS = ("exe", "alias", "path_add", "sha256", "raw_copy")
_KNOWN = set(_STR_LIST) | set(_STR_FIELDS) | {"msi", "archive", "post"}


class ConfigError(ValueError):
    pass


def load_config(path: Optional[str] = None) -> Dict:
    """Read + validate the catalog.  Raises ConfigError with the offending
    tool/field in the message (the reference fails at runtime inside the
    VM instead)."""
    if path is None:
        path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "tools_config.json")
    with open(path) as f:
        cfg = json.load(f)
    if cfg.get("schema") != 1:
        raise ConfigError(f"unsupported schema {cfg.get('schema')!r}")
    tools = cfg.get("tools")
    if not isinstance(tools, dict) or not tools:
        raise ConfigError("'tools' must be a non-empty object")
    for name, spec in tools.items():
        _validate_tool(name, spec, tools)
    return cfg


def _validate_tool(name: str, spec: Dict, tools: Dict) -> None:
    if not isinstance(spec, dict):
        raise ConfigError(f"{name}: spec must be an object")
    unknown = set(spec) - _KNOWN
    if unknown:
        raise ConfigError(f"{name}: unknown fields {sorted(unknown)}")
    mirrors = spec.get("mirrors")
    if not isinstance(mirrors, list) or not mirrors or not all(
        isinstance(u, str) and u.startswith(("http://", "https://"))
        for u in mirrors
    ):
        raise ConfigError(f"{name}: 'mirrors' must be a non-empty URL list")
    if not isinstance(spec.get("exe"), str) or not spec["exe"]:
        raise ConfigError(f"{name}: 'exe' (install marker path) is required")
    modes = [bool(spec.get("archive")), bool(spec.get("raw_copy")),
             "args" in spec]
    if sum(modes) != 1:
        raise ConfigError(
            f"{name}: exactly one of args / archive / raw_copy required"
        )
    if spec.get("archive") is not None:
        a = spec["archive"]
        if not isinstance(a, dict) or set(a) != {"kind", "dest"}:
            raise ConfigError(f"{name}: archive needs exactly kind+dest")
    for field in _STR_LIST:
        if field in spec and (
            not isinstance(spec[field], list)
            or not all(isinstance(x, str) for x in spec[field])
        ):
            raise ConfigError(f"{name}: '{field}' must be a string list")
    for field in _STR_FIELDS:
        if field in spec and not isinstance(spec[field], str):
            raise ConfigError(f"{name}: '{field}' must be a string")
    for dep in spec.get("requires", ()):
        if dep not in tools:
            raise ConfigError(f"{name}: requires unknown tool {dep!r}")


def build_plan(cfg: Dict, installed: Optional[set] = None) -> List[Dict]:
    """Dependency-ordered step list.  Each step:
    {tool, mirrors, exe, action: install|extract|copy, args, alias,
     path_add, sha256, post} — the executor (mock or PowerShell) consumes
    these uniformly.  Tools whose exe already exists (`installed`) are
    skipped, mirroring the reference's Test-Path guards."""
    tools = cfg["tools"]
    installed = installed or set()
    done: List[str] = []
    plan: List[Dict] = []

    def visit(name: str, chain: tuple) -> None:
        if name in done:
            return
        if name in chain:
            raise ConfigError(f"dependency cycle: {' -> '.join(chain + (name,))}")
        for dep in tools[name].get("requires", ()):
            visit(dep, chain + (name,))
        done.append(name)
        if name in installed:
            return
        spec = tools[name]
        action = ("extract" if spec.get("archive")
                  else "copy" if spec.get("raw_copy") else "install")
        plan.append({
            "tool": name,
            "mirrors": list(spec["mirrors"]),
            "exe": spec["exe"],
            "action": action,
            "msi": bool(spec.get("msi")),
            "args": list(spec.get("args", ())),
            "archive": spec.get("archive"),
            "raw_copy": spec.get("raw_copy"),
            "alias": spec.get("alias"),
            "path_add": spec.get("path_add"),
            "sha256": spec.get("sha256"),
            "post": spec.get("post"),
        })

    for name in tools:
        visit(name, ())
    return plan


def run_plan(
    plan: List[Dict],
    download: Callable[[str, str], bool],
    run: Callable[[Dict], None],
    max_retries: int = 3,
) -> Dict[str, str]:
    """Execute a plan with injected IO (the CI mock path; the VM path is
    install_tools.ps1 with the same semantics).  Per tool: try each mirror
    up to max_retries times (setup-tools.psm1
    Invoke-DownloadFileFromAvailableMirrors), then hand the step to `run`.
    Returns {tool: 'ok'|'download-failed'|'install-failed: ...'}."""
    results: Dict[str, str] = {}
    for step in plan:
        dest = f"installer-{step['tool']}"
        got = False
        for url in step["mirrors"]:
            for _ in range(max_retries):
                if download(url, dest):
                    got = True
                    break
            if got:
                break
        if not got:
            results[step["tool"]] = "download-failed"
            continue
        try:
            run(step)
            results[step["tool"]] = "ok"
        except Exception as e:  # keep provisioning the rest (reference
            # likewise logs and continues per app)
            results[step["tool"]] = f"install-failed: {e}"
    return results
