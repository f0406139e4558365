"""bench.py stage-plan rotation (VERDICT r4 weak #4).

Stages that missed the last driver artifact must run right after the
headline so a starved stage cannot starve twice in a row."""

import importlib.util
import json
import os


def _load_bench(tmp_path, artifact: dict | None):
    """Import bench.py fresh with cwd-relative artifact control: copy the
    module file into tmp_path and drop a fake newest artifact next to it."""
    import shutil

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    shutil.copy(os.path.join(here, "bench.py"), tmp_path / "bench.py")
    if artifact is not None:
        with open(tmp_path / "BENCH_r99.json", "w") as f:
            json.dump(artifact, f)
    spec = importlib.util.spec_from_file_location(
        f"bench_plan_test_{bool(artifact)}", tmp_path / "bench.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_missing_stages_promoted(tmp_path):
    art = {"parsed": {"stages": {
        "headline": "ok (10s)", "oracle": "ok (12s)", "ekf": "timeout",
        "kernels": "ok (18s)", "pf10240": "ok (6s)", "fidelity": "ok (7s)",
        "scaling_tpu": "ok (20s)", "building_pf": "skipped (deadline)",
        "building_graph": "ok (100s)", "building": "ok (90s)",
        "graph": "ok (12s)", "submap": "failed (boom)",
        "streaming": "ok (30s)", "scaling": "ok (70s)"}}}
    mod = _load_bench(tmp_path, art)
    order = [n for n, _, _ in mod.PLAN]
    assert order[0] == "headline"
    # the three non-ok stages come right after the headline, base order kept
    assert order[1:4] == ["ekf", "building_pf", "submap"]
    # every stage still present exactly once
    assert sorted(order) == sorted(n for n, _, _ in mod._BASE_PLAN)


def test_no_artifact_keeps_base_order(tmp_path):
    mod = _load_bench(tmp_path, None)
    assert [n for n, _, _ in mod.PLAN] == [n for n, _, _ in mod._BASE_PLAN]
