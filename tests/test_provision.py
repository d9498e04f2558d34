"""Guest app-provisioning layer: schema validation + mock install run.

Reference: omnitool/omnibox/vm/win11setup/setupscripts/setup.ps1:350-391
(per-app install blocks) and setup-tools.psm1 (mirror fallback + retry
download).  The repo's catalog is data-driven (omnibox/setup/
tools_config.json -> provision.py plan -> install_tools.ps1); these tests
pin the shipped catalog and the plan/executor semantics without a VM.
"""

import importlib.util
import os

import pytest

_P = os.path.join(os.path.dirname(__file__), "..", "omnibox", "setup", "provision.py")
spec = importlib.util.spec_from_file_location("provision", _P)
provision = importlib.util.module_from_spec(spec)
spec.loader.exec_module(provision)


def test_shipped_catalog_valid_and_covers_reference_apps():
    cfg = provision.load_config()
    tools = cfg["tools"]
    # the agent-facing app classes the reference provisions (browser,
    # office, media, editor, mail, runtime) must all be present
    for name in ("python", "git", "7zip", "chrome", "libreoffice", "vlc",
                 "gimp", "vscode", "thunderbird", "ffmpeg", "caddy"):
        assert name in tools, f"catalog missing {name}"
    assert len(tools) >= 11


def test_plan_is_dependency_ordered_and_complete():
    cfg = provision.load_config()
    plan = provision.build_plan(cfg)
    order = [s["tool"] for s in plan]
    assert len(order) == len(set(order)) == len(cfg["tools"])
    # ffmpeg extraction needs 7zip first
    assert order.index("7zip") < order.index("ffmpeg")
    for step in plan:
        assert step["action"] in ("install", "extract", "copy")
        assert step["mirrors"] and step["exe"]


def test_plan_skips_installed():
    cfg = provision.load_config()
    plan = provision.build_plan(cfg, installed={"python", "chrome"})
    tools = [s["tool"] for s in plan]
    assert "python" not in tools and "chrome" not in tools


@pytest.mark.parametrize("mutate,msg", [
    (lambda c: c["tools"]["vlc"].pop("mirrors"), "mirrors"),
    (lambda c: c["tools"]["vlc"].update(mirrors=["ftp://x"]), "mirrors"),
    (lambda c: c["tools"]["vlc"].pop("exe"), "exe"),
    (lambda c: c["tools"]["vlc"].update(bogus=1), "unknown fields"),
    (lambda c: c["tools"]["vlc"].update(requires=["nope"]), "unknown tool"),
    (lambda c: c["tools"]["vlc"].pop("args"), "exactly one"),
    (lambda c: c.update(schema=2), "schema"),
])
def test_schema_violations_caught(tmp_path, mutate, msg):
    import json

    cfg = provision.load_config()
    mutate(cfg)
    p = tmp_path / "bad.json"
    p.write_text(json.dumps(cfg))
    with pytest.raises(provision.ConfigError, match=msg):
        provision.load_config(str(p))


def test_dependency_cycle_detected(tmp_path):
    import json

    cfg = provision.load_config()
    cfg["tools"]["7zip"]["requires"] = ["ffmpeg"]  # ffmpeg already requires 7zip
    p = tmp_path / "cycle.json"
    p.write_text(json.dumps(cfg))
    cfg = provision.load_config(str(p))  # schema-valid; cycle found at plan
    with pytest.raises(provision.ConfigError, match="cycle"):
        provision.build_plan(cfg)


def test_mock_run_mirror_fallback_and_retry():
    cfg = provision.load_config()
    plan = provision.build_plan(cfg)
    attempts = {}

    def download(url, dest):
        attempts.setdefault(dest, []).append(url)
        # first mirror always fails; second (when present) succeeds on
        # the 2nd retry — exercises both fallback axes
        tool = dest.removeprefix("installer-")
        mirrors = cfg["tools"][tool]["mirrors"]
        if url == mirrors[0] and len(mirrors) > 1:
            return False
        return attempts[dest].count(url) >= 2

    installed = []
    results = provision.run_plan(plan, download, lambda s: installed.append(s["tool"]))
    assert all(v == "ok" for v in results.values()), results
    assert set(installed) == set(cfg["tools"])
    # multi-mirror tools exhausted mirror 1's retries before falling back
    libre = attempts["installer-libreoffice"]
    m = cfg["tools"]["libreoffice"]["mirrors"]
    assert libre.count(m[0]) == 3 and m[1] in libre


def test_mock_run_reports_failures_and_continues():
    cfg = provision.load_config()
    plan = provision.build_plan(cfg)

    def download(url, dest):
        return "gimp" not in dest  # every gimp mirror dead

    def run(step):
        if step["tool"] == "vlc":
            raise RuntimeError("installer exit 1")

    results = provision.run_plan(plan, download, run)
    assert results["gimp"] == "download-failed"
    assert results["vlc"].startswith("install-failed")
    assert results["chrome"] == "ok"  # later tools unaffected
