"""Reference-parity launcher: `python main_viz.py <args>`.

Implementation in `disvae_tpu.cli_viz` (the `disvae-tpu-viz` console
script); see main.py's docstring for the shim rationale.
"""

from disvae_tpu.cli_viz import *  # noqa: F401,F403
from disvae_tpu.cli_viz import RES_DIR, cli, main, parse_arguments  # noqa: F401

if __name__ == "__main__":
    cli()
