"""docs/MIGRATION.md stays true.

The migration guide is the contract page a reference user reads first, so
its claims are gated mechanically: every `--flag` it names must exist in
one of the two CLI parsers, every dotted `disvae_tpu.*` name it mentions
must import, and every repo file it links must exist.
"""

import argparse
import glob
import importlib
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _doc():
    with open(os.path.join(REPO, "docs", "MIGRATION.md")) as f:
        return f.read()


def _parser_options(module, argv):
    """All option strings the module's argparse parser registers."""
    mod = importlib.import_module(module)
    opts = set()
    real_parse = argparse.ArgumentParser.parse_args

    def spy_parse(self, args=None, namespace=None):
        for action in self._actions:
            opts.update(action.option_strings)
        raise SystemExit(0)

    argparse.ArgumentParser.parse_args = spy_parse
    try:
        mod.parse_arguments(argv)
    except SystemExit:
        pass
    finally:
        argparse.ArgumentParser.parse_args = real_parse
    return opts


def test_every_named_flag_exists():
    doc = _doc()
    named = set(re.findall(r"`(--[a-z][a-z0-9-]*)", doc))
    assert named, "MIGRATION.md lost its flag references"
    known = (_parser_options("disvae_tpu.cli", ["dummy"]) |
             _parser_options("disvae_tpu.cli_viz", ["dummy", "all"]))
    missing = sorted(named - known)
    assert not missing, "MIGRATION.md names unknown flags: %s" % missing


def test_every_named_module_imports():
    doc = _doc()
    mods = set(re.findall(r"`(disvae_tpu(?:\.[A-Za-z_]+)+)", doc))
    assert mods, "MIGRATION.md lost its module references"
    for dotted in sorted(mods):
        # import the longest importable prefix, getattr the rest
        parts = dotted.split(".")
        mod, rest = None, []
        for cut in range(len(parts), 0, -1):
            try:
                mod = importlib.import_module(".".join(parts[:cut]))
                rest = parts[cut:]
                break
            except ImportError:
                continue
        assert mod is not None, dotted
        obj = mod
        for name in rest:
            assert hasattr(obj, name), (dotted, name)
            obj = getattr(obj, name)


def test_linked_repo_files_exist():
    for rel in ["PARITY.md", os.path.join("docs", "API.md"),
                os.path.join("tests", "test_datasets.py")]:
        assert os.path.exists(os.path.join(REPO, rel)), rel


def test_quoted_test_count_is_current():
    """The guide quotes a suite size; keep it within sight of reality
    (counted lexically — cheap and stable, no pytest subprocess)."""
    m = re.search(r"(\d+)-test suite", _doc())
    # the quoted figure counts test FUNCTIONS (parametrization expands
    # the collected number beyond it)
    assert m, "MIGRATION.md lost its test-count claim"
    quoted = int(m.group(1))
    actual = 0
    for path in glob.glob(os.path.join(REPO, "tests", "test_*.py")):
        with open(path) as f:
            actual += len(re.findall(r"^def test_", f.read(), flags=re.M))
    assert abs(quoted - actual) <= 20, (
        "MIGRATION.md quotes a %d-test suite but %d test functions exist — "
        "update the guide" % (quoted, actual))
