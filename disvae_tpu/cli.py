"""Train and evaluate disentangled VAEs on TPU.

Implementation of the repo-root `main.py` launcher (shipped in the wheel
as `disvae_tpu.cli`; the root file is a thin reference-parity shim).
CLI-compatible with the reference's main.py:28-248: same option groups,
experiment names, INI layering (`-x <loss>_<dataset>` merges
Common_<dataset> -> Common_<loss> -> [<loss>_<dataset>] onto the defaults),
FactorVAE batch/epoch doubling, and `results/<name>/` artifact layout.
"""

import argparse
import logging
import os
import sys

import jax

from disvae_tpu.data.datasets import DATASETS, get_dataloaders, get_img_size
from disvae_tpu.models.vae import MODELS, init_specific_model
from disvae_tpu.ops.losses import LOSSES, RECON_DIST, get_loss_f
from disvae_tpu.ops.precision import PRECISIONS, configure
from disvae_tpu.train.evaluate import Evaluator
from disvae_tpu.train.trainer import Trainer
from disvae_tpu.utils.helpers import (FormatterNoDuplicate,
                                      create_safe_directory,
                                      get_config_section, get_n_param,
                                      set_seed, update_namespace_)
from disvae_tpu.utils.modelIO import load_metadata, load_model, save_model
from disvae_tpu.utils.visualize import GifTraversalsTraining

CONFIG_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "hyperparam.ini")
RES_DIR = "results"
LOG_LEVELS = ["CRITICAL", "ERROR", "WARNING", "INFO", "DEBUG", "NOTSET"]
ADDITIONAL_EXP = ["custom", "debug", "best_celeba", "best_dsprites"]
EXPERIMENTS = ADDITIONAL_EXP + ["{}_{}".format(loss, data)
                                for loss in LOSSES
                                for data in DATASETS]


def parse_arguments(args_to_parse):
    """Parse CLI arguments, then overlay the chosen experiment's INI layers."""
    default_config = get_config_section([CONFIG_FILE], "Custom")

    description = ("TPU-native (JAX) implementation and evaluation of "
                   "disentangled Variational AutoEncoders and metrics.")
    parser = argparse.ArgumentParser(description=description,
                                     formatter_class=FormatterNoDuplicate)

    general = parser.add_argument_group('General options')
    general.add_argument('name', type=str,
                         help="Run name; artifacts are read from and written to results/<name>/.")
    general.add_argument('-L', '--log-level', help="Verbosity of the stderr logger.",
                         default=default_config['log_level'],
                         choices=[l.lower() for l in LOG_LEVELS] + LOG_LEVELS)
    general.add_argument('--no-progress-bar', action='store_true',
                         default=default_config['no_progress_bar'],
                         help='Turn off the per-epoch tqdm bar.')
    general.add_argument('--no-cuda', action='store_true',
                         default=default_config['no_cuda'],
                         help='Accepted for CLI compat; device choice is '
                              'JAX platform driven.')
    general.add_argument('-s', '--seed', type=int,
                         default=default_config['seed'],
                         help='Base PRNG seed; set `seed = None` in '
                              'hyperparam.ini to draw one from the clock.')
    general.add_argument('--precision', default="highest",
                         choices=PRECISIONS,
                         help='Matmul/conv precision on TPU: highest for '
                              'reference parity, default for bf16 speed.')
    general.add_argument('--resume', action='store_true', default=False,
                         help='Resume training from the train_state.msgpack '
                              'checkpoint in the results directory (exact '
                              'state: weights, optimizer moments, step '
                              'counter, RNG).')
    general.add_argument('--profile', action='store_true', default=False,
                         help='Write a jax.profiler trace of the training '
                              'run to results/<name>/profile/.')
    general.add_argument('--debug-nans', action='store_true', default=False,
                         help='Enable jax_debug_nans: error out on the first '
                              'NaN produced on device.')
    general.add_argument('--model-parallel', type=int, default=1,
                         help='Devices per tensor-parallel group on the '
                              'mesh\'s "model" axis (FactorVAE '
                              'discriminator sharding); the remaining '
                              'devices form the data-parallel axis.')
    general.add_argument('--no-mesh', action='store_true', default=False,
                         help='Train single-device even when multiple chips '
                              'are visible (data parallelism over all '
                              'devices is otherwise the default).')
    general.add_argument('--resident-data', default='auto',
                         choices=['auto', 'always', 'never'],
                         help='Keep the wire-format dataset resident in '
                              'device memory and feed epochs by index '
                              '(one host->device transfer total). "auto" '
                              'adopts it when the dataset fits the '
                              'residency budget.')
    general.add_argument('--no-viz-gif', action='store_true', default=False,
                         help='Skip the per-epoch latent-traversal gif '
                              '(training.gif). Rendering it syncs the '
                              'device every epoch; without it the trainer '
                              'pipelines epochs (fetch of epoch N overlaps '
                              'epoch N+1 compute) for peak throughput.')

    training = parser.add_argument_group('Training specific options')
    training.add_argument('--checkpoint-every', type=int,
                          default=default_config['checkpoint_every'],
                          help='Epoch interval between model-<i>.npz snapshots.')
    training.add_argument('-d', '--dataset',
                          default=default_config['dataset'], choices=DATASETS,
                          help="Which registered dataset to train on.")
    training.add_argument('-x', '--experiment',
                          default=default_config['experiment'],
                          choices=EXPERIMENTS,
                          help='Named experiment whose INI sections overlay the '
                               'other flags (anything but `custom` wins).')
    training.add_argument('-e', '--epochs', type=int,
                          default=default_config['epochs'],
                          help='How many passes over the training set.')
    training.add_argument('-b', '--batch-size', type=int,
                          default=default_config['batch_size'],
                          help='Images per optimizer step.')
    training.add_argument('--lr', type=float, default=default_config['lr'],
                          help='Adam step size for the VAE parameters.')

    model = parser.add_argument_group('Model specific options')
    model.add_argument('-m', '--model-type',
                       default=default_config['model'], choices=MODELS,
                       help='Architecture family for the encoder/decoder pair.')
    model.add_argument('-z', '--latent-dim', type=int,
                       default=default_config['latent_dim'],
                       help='Size of the latent code z.')
    model.add_argument('-l', '--loss',
                       default=default_config['loss'], choices=LOSSES,
                       help="Objective used to train the VAE.")
    model.add_argument('-r', '--rec-dist',
                       default=default_config['rec_dist'], choices=RECON_DIST,
                       help="Per-pixel reconstruction likelihood family.")
    model.add_argument('-a', '--reg-anneal', type=float,
                       default=default_config['reg_anneal'],
                       help="Steps over which the regularizer weight ramps "
                            "linearly from 0 to its final value.")

    betaH = parser.add_argument_group('BetaH specific parameters')
    betaH.add_argument('--betaH-B', type=float,
                       default=default_config['betaH_B'],
                       help="KL coefficient (the Higgins et al. beta).")

    betaB = parser.add_argument_group('BetaB specific parameters')
    betaB.add_argument('--betaB-initC', type=float,
                       default=default_config['betaB_initC'],
                       help="Capacity C at step 0.")
    betaB.add_argument('--betaB-finC', type=float,
                       default=default_config['betaB_finC'],
                       help="Capacity C after annealing completes.")
    betaB.add_argument('--betaB-G', type=float,
                       default=default_config['betaB_G'],
                       help="Coefficient on |KL - C| (the Burgess et al. gamma).")

    factor = parser.add_argument_group('factor VAE specific parameters')
    factor.add_argument('--factor-G', type=float,
                        default=default_config['factor_G'],
                        help="Coefficient on the adversarial TC estimate (Kim & Mnih gamma).")
    factor.add_argument('--lr-disc', type=float,
                        default=default_config['lr_disc'],
                        help='Adam step size for the FactorVAE discriminator.')

    btcvae = parser.add_argument_group('beta-tcvae specific parameters')
    btcvae.add_argument('--btcvae-A', type=float,
                        default=default_config['btcvae_A'],
                        help="Coefficient on the index-code mutual information (Chen et al. alpha).")
    btcvae.add_argument('--btcvae-G', type=float,
                        default=default_config['btcvae_G'],
                        help="Coefficient on the dimension-wise KL (Chen et al. gamma).")
    btcvae.add_argument('--btcvae-B', type=float,
                        default=default_config['btcvae_B'],
                        help="Coefficient on the total correlation (Chen et al. beta).")

    evaluation = parser.add_argument_group('Evaluation specific options')
    evaluation.add_argument('--is-eval-only', action='store_true',
                            default=default_config['is_eval_only'],
                            help='Skip training; run evaluation on the saved model '
                                 'in results/<name>/.')
    evaluation.add_argument('--is-metrics', action='store_true',
                            default=default_config['is_metrics'],
                            help="Also compute MIG/AAM (needs ground-truth factors, "
                                 "i.e. dsprites).")
    evaluation.add_argument('--no-test', action='store_true',
                            default=default_config['no_test'],
                            help="Skip the test-loss pass.")
    evaluation.add_argument('--eval-batchsize', type=int,
                            default=default_config['eval_batchsize'],
                            help='Images per device call during evaluation.')
    evaluation.add_argument('--corrected-mig', action='store_true',
                            default=False,
                            help='Compute MIG/AAM with the mathematically '
                                 'correct sample handling instead of '
                                 'reproducing the reference estimator\'s '
                                 'sample-scrambling quirk (which dilutes '
                                 'MIG by more than 10x).')
    evaluation.add_argument('--fast-metrics', action='store_true',
                            default=False,
                            help='Estimate MIG/AAM entropies with the bf16 '
                                 'MXU kernel (~2.4x faster than the exact '
                                 'streaming scan, ~2e-2 log-density error) '
                                 '— for exploratory sweeps, not parity '
                                 'comparisons.')

    args = parser.parse_args(args_to_parse)
    if args.experiment != 'custom':
        if args.experiment not in ADDITIONAL_EXP:
            # layering: Common_<dataset> then Common_<loss>
            loss, dataset = args.experiment.split("_")
            update_namespace_(args, get_config_section(
                [CONFIG_FILE], "Common_{}".format(dataset)))
            update_namespace_(args, get_config_section(
                [CONFIG_FILE], "Common_{}".format(loss)))
        try:
            update_namespace_(args, get_config_section([CONFIG_FILE],
                                                       args.experiment))
        except KeyError as e:
            if args.experiment in ADDITIONAL_EXP:
                raise e
    return args


def main(args):
    formatter = logging.Formatter(
        '%(asctime)s %(levelname)s - %(funcName)s: %(message)s', "%H:%M:%S")
    logger = logging.getLogger(__name__)
    logger.setLevel(args.log_level.upper())
    stream = logging.StreamHandler()
    stream.setLevel(args.log_level.upper())
    stream.setFormatter(formatter)
    logger.addHandler(stream)

    configure(args.precision)
    if args.precision == "highest" and not args.is_eval_only:
        # Out-of-the-box default favors reference parity; make the 4.3x
        # production-throughput cliff visible instead of silent
        # (benchmarks/scaling.py: 59k vs 270k img/s at b256 on v5e).
        logger.info(
            "Training at --precision highest (f32-equivalent matmuls, the "
            "parity default). For production throughput on TPU use "
            "`--precision default` (bf16 MXU passes over f32 data, ~4.3x "
            "faster at this model size; see README scaling table).")
    if args.debug_nans:
        jax.config.update("jax_debug_nans", True)

    # Scale-out: multi-host runtime (no-op on one host), then a
    # ('data', 'model') mesh over every visible chip. Data parallelism is
    # the default whenever more than one device is visible — the reference
    # has no distributed story at all (its main.py:183 picks a single
    # cuda-or-cpu device); here the same CLI drives the whole slice.
    from disvae_tpu.parallel import distributed
    from disvae_tpu.parallel.distributed import barrier, is_writer
    from disvae_tpu.parallel.mesh import create_mesh
    distributed.initialize()
    mesh = None
    if not getattr(args, "no_mesh", False) and \
            (jax.device_count() > 1 or args.model_parallel > 1):
        mesh = create_mesh(model_parallel=args.model_parallel)
        logger.info("Device mesh: {} data x {} model over {} {} device(s)"
                    .format(mesh.shape["data"], mesh.shape["model"],
                            mesh.devices.size,
                            mesh.devices.flatten()[0].platform))

    key = set_seed(args.seed)
    if key is None:
        import time
        key = jax.random.PRNGKey(int(time.time()))
    init_key, train_key, eval_key = jax.random.split(key, 3)

    exp_dir = os.path.join(RES_DIR, args.name)
    logger.info("Root directory for saving and loading experiments: {}"
                .format(exp_dir))

    trainer = train_loader = None
    if not args.is_eval_only:
        # Rank 0 owns the results dir (archive-then-create must happen once,
        # not once per host); other ranks wait for it to exist.
        if is_writer():
            if not args.resume:
                create_safe_directory(exp_dir, logger=logger)
            else:
                os.makedirs(exp_dir, exist_ok=True)
        barrier("disvae:results-dir")

        if args.loss == "factor":
            logger.info("FactorVAE consumes two half-batches per iteration; "
                        "doubling batch size and epoch count so each epoch "
                        "sees the dataset the same number of times.")
            args.batch_size *= 2
            args.epochs *= 2

        # On a multi-host pod each process feeds only its slice of every
        # global batch; the (seed, epoch)-keyed permutation is identical on
        # all hosts, so the union of slices is exactly the global batch.
        host_slice = None
        pad_global_to = None
        if jax.process_count() > 1:
            if mesh is None:
                # without a mesh there are no collectives: each process
                # would silently train its OWN model on 1/N of the data
                raise ValueError(
                    "--no-mesh is not valid on a multi-host run: host-"
                    "sliced feeding only makes sense as the SPMD feed of "
                    "a device mesh.")
            host_slice = (jax.process_index(), jax.process_count())
            # equal per-host shares of every (globally padded) batch —
            # see DataLoader.pad_global_to
            pad_global_to = int(mesh.shape["data"])
        train_loader = get_dataloaders(args.dataset,
                                       batch_size=args.batch_size,
                                       logger=logger, seed=args.seed,
                                       host_slice=host_slice,
                                       pad_global_to=pad_global_to)
        logger.info("Train {} with {} samples".format(
            args.dataset, len(train_loader.dataset)))

        args.img_size = get_img_size(args.dataset)
        model, params = init_specific_model(args.model_type, args.img_size,
                                            args.latent_dim, key=init_key)
        logger.info('Num parameters in model: {}'.format(get_n_param(params)))

        # Rank 0 renders the training gif. On multi-host its params arrive
        # committed to the GLOBAL mesh; running the viz jits on them would
        # schedule mesh-wide programs the other ranks never execute (hang),
        # so the wrapper detours each frame's params through the host onto
        # a local device (~500K params — negligible).
        gif_visualizer = None
        if is_writer() and not getattr(args, "no_viz_gif", False):
            gif_visualizer = GifTraversalsTraining(model, args.dataset,
                                                   exp_dir)
            if jax.process_count() > 1:
                gif_visualizer = _LocalDeviceGif(gif_visualizer)
        loss_f = get_loss_f(args.loss,
                            n_data=len(train_loader.dataset),
                            device=None,
                            **vars(args))
        trainer = Trainer(model, params, loss_f, lr=args.lr,
                          rng=train_key,
                          logger=logger,
                          save_dir=exp_dir,
                          is_progress_bar=not args.no_progress_bar,
                          gif_visualizer=gif_visualizer,
                          mesh=mesh,
                          resident=args.resident_data,
                          resume=args.resume,
                          skip_tiny_tail=True)
        if args.profile:
            profile_dir = os.path.join(exp_dir, "profile")
            with jax.profiler.trace(profile_dir):
                trainer(train_loader,
                        epochs=args.epochs,
                        checkpoint_every=args.checkpoint_every)
            logger.info("Profiler trace written to {}".format(profile_dir))
        else:
            trainer(train_loader,
                    epochs=args.epochs,
                    checkpoint_every=args.checkpoint_every)

        # save the final model plus the full resolved config
        if is_writer():
            save_model(trainer.model, trainer.params, exp_dir,
                       metadata=vars(args))

    if (args.is_metrics or not args.no_test) and not is_writer():
        # Rank 0 evaluates alone: the eval path runs on local devices with
        # an un-sliced loader, so every rank would redundantly recompute
        # the SAME numbers and race writing the same artifact files.
        logger.info("Multi-host run: rank %d skips evaluation "
                    "(rank 0 computes and writes it).", jax.process_index())
    elif args.is_metrics or not args.no_test:
        model, params = load_model(exp_dir)
        metadata = load_metadata(exp_dir)
        test_loader = get_dataloaders(metadata["dataset"],
                                      batch_size=args.eval_batchsize,
                                      shuffle=False,
                                      logger=logger)
        loss_f = get_loss_f(args.loss,
                            n_data=len(test_loader.dataset),
                            device=None,
                            **vars(args))
        eval_mesh = mesh
        if jax.process_count() > 1:
            # The eval path device_puts host-local arrays against mesh-wide
            # shardings, which is only valid when every mesh device is
            # addressable from this process. On a multi-host pod each
            # process evaluates on its local devices instead (the test
            # loader is not host-sliced, so results are identical on every
            # host).
            logger.info("Multi-host run: evaluating on local devices.")
            eval_mesh = None
        # Reuse the trainer's HBM-resident wire upload for the metrics
        # encode when the eval loader covers the same image set (wire bytes
        # are a pure function of (dataset class, root, images)) — the
        # train+eval flow then never re-ships the dataset.
        eval_resident = args.resident_data
        if (trainer is not None and eval_mesh is mesh
                and trainer.resident_data is not None
                and type(test_loader.dataset) is type(train_loader.dataset)
                and len(test_loader.dataset) == len(train_loader.dataset)
                and getattr(test_loader.dataset, "root", None)
                == getattr(train_loader.dataset, "root", None)):
            logger.info("Evaluator reuses the training run's HBM-resident "
                        "dataset upload.")
            eval_resident = trainer.resident_data
        evaluator = Evaluator(model, params, loss_f,
                              rng=eval_key,
                              logger=logger,
                              save_dir=exp_dir,
                              is_progress_bar=not args.no_progress_bar,
                              mesh=eval_mesh,
                              scramble_quirk=not args.corrected_mig,
                              fast_entropies=args.fast_metrics,
                              resident=eval_resident)
        evaluator(test_loader, is_metrics=args.is_metrics,
                  is_losses=not args.no_test)

    # no rank exits while another still has collective work in flight
    barrier("disvae:end")


class _LocalDeviceGif:
    """Multi-host adapter for GifTraversalsTraining: re-homes each frame's
    (fully replicated) params from the global mesh onto one local device so
    the viz jits compile as purely local programs."""

    def __init__(self, base):
        self._base = base
        self._device = jax.local_devices()[0]

    def __call__(self, params):
        self._base(jax.device_put(jax.device_get(params), self._device))

    def save_reset(self):
        self._base.save_reset()


def cli():
    """Console-script entry point (`disvae-tpu-train`, pyproject.toml) and
    the body of the repo-root `python main.py` launcher."""
    main(parse_arguments(sys.argv[1:]))


if __name__ == '__main__':
    cli()
