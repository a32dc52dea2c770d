"""General host-side helpers: config parsing, seeding, run-directory lifecycle.

TPU-native counterpart of the reference's `utils/helpers.py` (config loading at
utils/helpers.py:56-68, seeding at :23-30, safe directories at :12-20). Seeding
here additionally derives an explicit `jax.random` PRNG key, which the rest of
the framework threads functionally instead of relying on global RNG state.
"""

import argparse
import ast
import configparser
import os
import random
import shutil

import numpy as np


def get_config_section(filenames, section):
    """Return a dict for one section of layered ``.ini`` files.

    Uses ``ExtendedInterpolation`` so values may cross-reference other sections
    (``${factor_dsprites:factor_G}``) and ``ast.literal_eval`` so values carry
    real Python types (ints, floats, strings, bools, lists).
    """
    parser = configparser.ConfigParser(
        interpolation=configparser.ExtendedInterpolation())
    parser.optionxform = str  # preserve case of keys
    read_ok = parser.read(filenames)
    if not read_ok:
        raise ValueError("Config files not found: {}".format(filenames))
    return {k: ast.literal_eval(v) for k, v in dict(parser[section]).items()}


def update_namespace_(namespace, dictionary):
    """In-place update of an argparse namespace from a dict."""
    vars(namespace).update(dictionary)


def create_safe_directory(directory, logger=None):
    """Create `directory`; if it exists, archive it to ``<directory>.zip`` first."""
    if os.path.exists(directory):
        if logger is not None:
            logger.warning("Directory {} already exists. Archiving it to {}.zip"
                           .format(directory, directory))
        shutil.make_archive(directory, "zip", directory)
        shutil.rmtree(directory)
    os.makedirs(directory)


def set_seed(seed):
    """Seed host-side RNGs and return a JAX PRNG key (or None for stochastic).

    Host numpy/random are seeded for anything host-side (sample selection for
    viz); device randomness is fully controlled by the returned key, which
    callers split per purpose/step.
    """
    if seed is None:
        return None
    np.random.seed(seed)
    random.seed(seed)
    import jax
    return jax.random.PRNGKey(seed)


def get_n_param(params):
    """Number of scalar parameters in a pytree of arrays."""
    import jax
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(params))


def check_bounds(value, type=float, lb=-float("inf"), ub=float("inf"),
                 is_inclusive=True, name="value"):
    """Argparse type-checker that enforces numeric bounds."""
    value = type(value)
    in_bound = (lb <= value <= ub) if is_inclusive else (lb < value < ub)
    if not in_bound:
        raise argparse.ArgumentTypeError(
            "{}={} outside of bounds ({},{})".format(name, value, lb, ub))
    return value


class FormatterNoDuplicate(argparse.ArgumentDefaultsHelpFormatter):
    """Help formatter that prints ``-e, --epoch EPOCH`` instead of repeating
    the metavar for every alias."""

    def _format_action_invocation(self, action):
        if not action.option_strings:
            default = self._get_default_metavar_for_positional(action)
            metavar, = self._metavar_formatter(action, default)(1)
            return metavar
        if action.nargs == 0:
            return ", ".join(action.option_strings)
        default = self._get_default_metavar_for_optional(action)
        args_string = self._format_args(action, default)
        return ", ".join(action.option_strings) + " " + args_string
