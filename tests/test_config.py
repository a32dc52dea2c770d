"""Config-system tests: INI layering must resolve exactly like the reference."""

import pytest

from disvae_tpu.cli import parse_arguments
from disvae_tpu.utils.helpers import get_config_section

CONFIG = "hyperparam.ini"


def test_custom_defaults():
    cfg = get_config_section([CONFIG], "Custom")
    assert cfg["seed"] == 1234
    assert cfg["batch_size"] == 64
    assert cfg["lr"] == 5e-4
    assert cfg["loss"] == "betaB"
    assert cfg["latent_dim"] == 10
    assert cfg["rec_dist"] == "bernoulli"
    assert cfg["no_progress_bar"] is False


def test_interpolation():
    """btcvae_B cross-references factor_G via ExtendedInterpolation."""
    assert get_config_section([CONFIG], "btcvae_dsprites")["btcvae_B"] == 6.4
    assert get_config_section([CONFIG], "btcvae_celeba")["btcvae_B"] == 6.4
    assert get_config_section([CONFIG], "btcvae_chairs")["btcvae_B"] == 3.2
    best = get_config_section([CONFIG], "best_celeba")
    assert best["epochs"] == 200 and best["lr"] == 5e-4
    assert best["rec_dist"] == "laplace"


@pytest.mark.parametrize("exp,expect", [
    ("betaH_celeba", dict(dataset="celeba", loss="betaH", betaH_B=10,
                          epochs=200, checkpoint_every=100, lr=5e-4)),
    ("betaB_dsprites", dict(dataset="dsprites", loss="betaB", betaB_finC=25,
                            epochs=30, lr=1e-3, reg_anneal=100000)),
    ("factor_dsprites", dict(dataset="dsprites", loss="factor", factor_G=6.4,
                             lr_disc=1e-4, lr=1e-4)),
    ("btcvae_celeba", dict(dataset="celeba", loss="btcvae", btcvae_B=6.4,
                           lr=5e-4, epochs=200)),
    ("VAE_mnist", dict(dataset="mnist", loss="VAE", epochs=400, lr=5e-4)),
])
def test_experiment_resolution(exp, expect):
    args = parse_arguments(["testrun", "-x", exp])
    for k, v in expect.items():
        assert getattr(args, k) == v, (k, getattr(args, k), v)


def test_debug_experiment():
    args = parse_arguments(["testrun", "-x", "debug"])
    assert args.epochs == 1 and args.no_test is True and args.reg_anneal == 0


def test_cli_overrides_take_effect():
    args = parse_arguments(["testrun", "-b", "128", "--lr", "0.01"])
    assert args.batch_size == 128 and args.lr == 0.01


def test_missing_section_raises():
    with pytest.raises(KeyError):
        get_config_section([CONFIG], "NoSuchSection")


def test_missing_file_raises():
    with pytest.raises(ValueError):
        get_config_section(["nonexistent.ini"], "Custom")
