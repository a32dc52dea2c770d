"""Packaging metadata gates (pyproject.toml + console-script wrappers).

The wheel itself is built offline by `pip wheel --no-build-isolation .`;
these tests pin the metadata invariants that build relies on, without
invoking pip.
"""

import os
import tomllib

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def pyproject():
    with open(os.path.join(REPO, "pyproject.toml"), "rb") as f:
        return tomllib.load(f)


def test_console_scripts_resolve_to_real_callables(pyproject):
    """Every [project.scripts] target must exist and be zero-arg callable
    (setuptools resolves them at install time; a typo only explodes for
    the end user)."""
    import importlib
    scripts = pyproject["project"]["scripts"]
    assert set(scripts) == {"disvae-tpu-train", "disvae-tpu-viz"}
    for target in scripts.values():
        mod_name, func_name = target.split(":")
        func = getattr(importlib.import_module(mod_name), func_name)
        assert callable(func)
        # zero-arg: entry points are invoked with no arguments
        import inspect
        assert not inspect.signature(func).parameters


def test_dependencies_are_importable(pyproject):
    """The declared runtime deps must match what the package imports —
    all of them resolvable in this environment."""
    import importlib
    mod_for = {"Pillow": "PIL", "imageio": "imageio"}
    for dep in pyproject["project"]["dependencies"]:
        importlib.import_module(mod_for.get(dep, dep))


def test_requirements_txt_matches_pyproject(pyproject):
    """requirements.txt mirrors pyproject's canonical dependency list; this
    gate keeps the two from drifting."""
    with open(os.path.join(REPO, "requirements.txt")) as f:
        reqs = [line.strip() for line in f
                if line.strip() and not line.startswith("#")]
    assert reqs == pyproject["project"]["dependencies"]


def test_native_source_ships_as_package_data(pyproject):
    data = pyproject["tool"]["setuptools"]["package-data"]
    assert "*.cpp" in data["disvae_tpu.native"]
    assert os.path.exists(os.path.join(REPO, "disvae_tpu", "native",
                                       "gather.cpp"))
