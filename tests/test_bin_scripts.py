"""Gates for bin/*.sh (and the CLI-driving tools/ scripts): shell syntax,
and every `python main.py ...` invocation they issue must parse against
the REAL argparse surface and resolve its `-x` experiment against the real
hyperparam.ini (reference bin/*.sh drive the same matrix)."""

import glob
import os
import re
import shlex
import subprocess

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPTS = sorted(glob.glob(os.path.join(REPO, "bin", "*.sh"))) + [
    os.path.join(REPO, "tools", "evidence_run.sh"),
    os.path.join(REPO, "tools", "snapshot_artifacts.sh"),
]


@pytest.mark.parametrize("script", SCRIPTS, ids=os.path.basename)
def test_shell_syntax(script):
    subprocess.run(["bash", "-n", script], check=True)


def _cli_invocations(script):
    """Extract `python main.py ...` argv lists (joining \\ continuations)."""
    text = open(script).read().replace("\\\n", " ")
    out = []
    for line in text.splitlines():
        m = re.search(r"python (main(?:_viz)?\.py .+)$", line.strip())
        if m:
            out.append(shlex.split(m.group(1)))
    return out


def test_every_cli_invocation_parses():
    from disvae_tpu import cli as main_mod
    from disvae_tpu import cli_viz as viz_mod

    seen_train = seen_viz = 0
    for script in SCRIPTS:
        for argv in _cli_invocations(script):
            # substitute the loop variables bin scripts use; any other
            # shell variable (e.g. the mutual-info sweep's $alpha, the
            # plot scripts' cherry-picked index lists) gets a numeric
            # placeholder
            args = [a.replace("${loss}", "btcvae")
                     .replace("${dataset}", "dsprites")
                     .replace("${precision}", "highest")
                     .replace("$exp", "VAE_dsprites") for a in argv[1:]]
            # empty-default expansions (`${FLAGS:-}`) contribute no token
            args = [re.sub(r"\$\{\w+:-\}", "", a) for a in args]
            args = [re.sub(r"\$\{?\w+\}?", "1", a) for a in args if a]
            if argv[0] == "main.py":
                parsed = main_mod.parse_arguments(args)
                seen_train += 1
            else:
                parsed = viz_mod.parse_arguments(args)
                seen_viz += 1
            assert parsed.name
    # distinct invocation LINES (loops expand at run time):
    # train_all 4, metrics_all 1, train_mutual_info >=1; plot_all >=8
    assert seen_train >= 5 and seen_viz >= 8, (seen_train, seen_viz)
