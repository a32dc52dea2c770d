"""Reference-parity launcher: `python main.py <args>` (reference main.py).

The implementation lives in `disvae_tpu.cli` (shipped in the wheel; also
the `disvae-tpu-train` console script). This repo-root file only mirrors
the reference's invocation surface. Import `disvae_tpu.cli` directly for
programmatic use — the re-exports below exist for reference-style
`import main` compatibility only (module-level monkeypatching must target
disvae_tpu.cli).
"""

from disvae_tpu.cli import *  # noqa: F401,F403
from disvae_tpu.cli import RES_DIR, cli, main, parse_arguments  # noqa: F401

if __name__ == "__main__":
    cli()
