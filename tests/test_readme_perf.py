"""README perf-table drift gate: the block between the BENCH markers must
be exactly what tools/gen_readme_perf.py renders from the newest
BENCH_r*.json (VERDICT r3 weak #1 — one source of perf truth)."""

import importlib.util
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_tool():
    spec = importlib.util.spec_from_file_location(
        "gen_readme_perf", os.path.join(REPO, "tools", "gen_readme_perf.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_readme_perf_table_matches_latest_bench():
    tool = _load_tool()
    rnd, parsed = tool.latest_bench()
    block = tool.render_block(rnd, parsed)
    with open(os.path.join(REPO, "README.md")) as f:
        text = f.read()
    i, j = text.find(tool.BEGIN), text.find(tool.END)
    assert i >= 0 and j > i, "README.md lost its BENCH markers"
    current = text[i:j + len(tool.END)]
    assert current == block, (
        "README perf table is stale — run `python tools/gen_readme_perf.py` "
        "(BENCH_r%02d.json is the newest measurement)" % rnd)


def test_generator_handles_old_and_new_mig_keys():
    tool = _load_tool()
    # pre-r4 style: mig_eval_seconds is the cold pass
    tracked, cold = tool._mig_numbers(
        {"mig_eval_seconds": 71.6, "mig_eval_seconds_warm": 8.6})
    assert (tracked, cold) == (8.6, 71.6)
    # r4+ style: mig_eval_seconds already tracks warm; cold rides alongside
    tracked, cold = tool._mig_numbers(
        {"mig_eval_seconds": 8.6, "mig_eval_seconds_warm": 8.6,
         "mig_eval_seconds_cold": 71.6})
    assert (tracked, cold) == (8.6, 71.6)
