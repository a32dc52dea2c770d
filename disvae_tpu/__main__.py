"""`python -m disvae_tpu <args>` == the training CLI (main.py)."""

from disvae_tpu.cli import cli

if __name__ == "__main__":
    cli()
