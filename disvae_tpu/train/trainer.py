"""Training orchestration: epoch loop, metric recording, checkpointing.

Counterpart of reference disvae/training.py:17-196, re-built around JAX's
async dispatch model. The reference forces a device->host sync every
iteration (`loss.item()`, training.py:164); here each step returns one packed
metric vector whose transfer is deferred one step behind dispatch, so the
device never idles waiting on the host and the host never blocks on an
in-flight step.

Artifact parity: `train_losses.log` is CSV `Epoch,Loss,Value` with one row per
(epoch, metric) averaged over the steps where `global_step % 50 == 1`
(the reference's record_loss_every gate, losses.py:105-114), and checkpoints
are written every `checkpoint_every` epochs as `model-<epoch>.npz`.
"""

import logging
import os
from timeit import default_timer

import jax
import numpy as np

from disvae_tpu.data.prefetch import DevicePrefetcher
from disvae_tpu.models.discriminator import Discriminator
from disvae_tpu.ops.losses import RECORD_LOSS_EVERY, metric_key_order
from disvae_tpu.train.state import create_train_state
from disvae_tpu.train.steps import (make_disc_optimizer,
                                    make_multi_train_step, make_optimizer,
                                    make_train_step, stack_metrics)
from disvae_tpu.utils.modelIO import save_model

TRAIN_LOSSES_LOGFILE = "train_losses.log"
CKPT_FILE = "train_state.msgpack"

_NO_DATASET = object()  # sentinel distinct from any dataset (incl. None)


def _pack_metrics(device_metrics):
    """Concatenate a list of per-step metric arrays ((n_keys,) per single
    step, (K, n_keys) per K-step scan) into ONE device (n_rows, n_keys)
    array, and start its device->host copy in the background.

    MUST be called at DISPATCH time, not fetch time: the device stream
    executes programs in enqueue order, so a concatenate enqueued after the
    NEXT epoch's scan would wait behind that whole epoch and re-serialize
    the pipelined loop. Enqueued here, it runs right after its own epoch's
    steps, and copy_to_host_async starts the transfer the moment the rows
    exist — by the time the pipelined reduce asks for the values, they are
    already on the host (or en route), overlapped with the next epoch's
    compute."""
    import jax.numpy as jnp

    if not device_metrics:
        return None
    ms = [m if m.ndim == 2 else m[None] for m in device_metrics]
    packed = ms[0] if len(ms) == 1 else jnp.concatenate(ms, axis=0)
    try:
        packed.copy_to_host_async()
    except Exception:  # platform without async host copies: fetch pays full
        pass
    return packed


class Trainer:
    """Drives training of a (model, params) pair under a loss config.

    Parameters
    ----------
    model : disvae_tpu.models.vae.VAE
        Static model description.
    params : pytree
        Initial parameters.
    loss_f : loss config from disvae_tpu.ops.losses
    lr : float
        Adam learning rate (torch-default betas/eps).
    rng : jax.random key
        Training randomness (reparameterization, permutations). Split off the
        seed key; a separate key initializes the FactorVAE discriminator.
    save_dir : str
    gif_visualizer : callable(params) or None
        Called after every epoch to append a traversal frame.
    skip_tiny_tail : bool
        A ragged final batch of ONE sample is mathematically undefined for
        FactorVAE (empty half-batch, reference losses.py:246-251) and for
        btcvae with MSS (M = B-1 = 0 importance weights, reference
        math.py:54-73); the reference fails fast on it. By default this
        Trainer matches that contract and raises ValueError. True (the CLI
        default) instead skips the 1-sample batch with a warning — friendly
        for interactive runs, but one fewer training sample per epoch.
    """

    def __init__(self, model, params, loss_f, lr,
                 rng=None,
                 logger=logging.getLogger(__name__),
                 save_dir="results",
                 gif_visualizer=None,
                 is_progress_bar=True,
                 mesh=None,
                 steps_per_dispatch=16,
                 resident="auto",
                 resume=False,
                 pipeline_epochs=True,
                 skip_tiny_tail=False):
        self.model = model
        self.loss_f = loss_f
        self.save_dir = save_dir
        self.logger = logger
        self.is_progress_bar = is_progress_bar
        self.gif_visualizer = gif_visualizer
        self.steps_per_dispatch = max(1, int(steps_per_dispatch))
        self.mesh = mesh
        # Fetch epoch N's metrics only after dispatching epoch N+1 (resident
        # feed only): hides the device->host round-trip and next-epoch
        # permutation prep behind device compute. Identical numbers either
        # way; False restores strictly sequential epochs.
        self.pipeline_epochs = bool(pipeline_epochs)
        self.skip_tiny_tail = bool(skip_tiny_tail)
        self._start_epoch = 0

        if rng is None:
            rng = jax.random.PRNGKey(0)
        rng, disc_rng = jax.random.split(rng)

        optimizer = make_optimizer(lr)
        disc = None
        disc_optimizer = None
        if loss_f.needs_discriminator:
            disc = Discriminator(latent_dim=loss_f.latent_dim)
            disc_optimizer = make_disc_optimizer(loss_f)
        self.disc = disc
        self._optimizer = optimizer
        self._disc_optimizer = disc_optimizer
        self.state = create_train_state(model, params, optimizer, rng,
                                        disc=disc,
                                        disc_optimizer=disc_optimizer,
                                        disc_rng=disc_rng,
                                        loss_cfg=loss_f)
        self._train_step = make_train_step(model, loss_f, optimizer,
                                           disc=disc,
                                           disc_optimizer=disc_optimizer,
                                           mesh=mesh, state=self.state)
        self._multi_step = make_multi_train_step(model, loss_f, optimizer,
                                                 disc=disc,
                                                 disc_optimizer=disc_optimizer,
                                                 mesh=mesh, state=self.state)
        self._padded_step = None  # built on first ragged batch under a mesh
        # HBM-resident dataset feed (data/resident.py): "auto" adopts it
        # when the wire-format dataset fits the residency budget; "always"
        # ignores the budget; "never" forces the streaming pipeline.
        self.resident_policy = resident if isinstance(resident, str) else \
            ("always" if resident else "never")
        self._resident = None
        self._resident_ds = _NO_DATASET  # identity key of the cached feed
        self._warned_batch_pad = False
        # Host-side mirror of state.step. The environment rule (CLAUDE.md)
        # forbids fetching 0-d device scalars (they can hang the tunnel);
        # epoch bookkeeping reads this mirror instead of int(state.step).
        # Kept in sync by _reduce_epoch_metrics (one increment per executed
        # step = per packed metrics row) and seeded host-side on resume.
        self._host_step = 0
        self._resident_step = None
        self._gather = None
        self.metric_keys = metric_key_order(loss_f.name, model.latent_dim)
        if resume:
            self.load_checkpoint()
        # Artifact writes belong to rank 0 alone on a multi-host run (every
        # rank holds the same replicated state; concurrent writers would
        # race on a shared results dir). All ranks still READ the
        # checkpoint on --resume — multi-host resume assumes a shared fs.
        from disvae_tpu.parallel.distributed import is_writer
        self._is_writer = is_writer()
        # The log is truncated to rows strictly before the resume epoch: after
        # a hard kill (no SIGTERM checkpoint) the CSV may already hold rows
        # for epochs that will be re-run, and --resume with no checkpoint
        # must start a fresh log rather than append to a stale one.
        self.losses_logger = None
        if self._is_writer:
            self.losses_logger = LossesLogger(
                os.path.join(save_dir, TRAIN_LOSSES_LOGFILE),
                resume_from_epoch=self._start_epoch if resume else None)
        self.logger.info("Training Device: {}".format(
            jax.devices()[0].platform))

    @property
    def params(self):
        return self.state.params

    @property
    def resident_data(self):
        """The training run's HBM-resident wire upload (data/resident.py),
        or None. A caller evaluating the SAME images afterwards (the CLI's
        test/metrics phase) can hand this to Evaluator(resident=...) and
        skip a second multi-hundred-MB host->device upload."""
        return self._resident

    # ------------------------------------------------------------------
    # checkpoint / resume (full training state, atomic)
    #
    # The reference only persists weights (model-<i>.pt, modelIO.py:14-42)
    # and has no resume path at all (SURVEY.md section 5). Here the FULL
    # functional state — params, flattened Adam moments, discriminator +
    # its Adam, the step counter, and the PRNG key — serializes to one
    # msgpack written atomically (tmp + rename), so a preempted run
    # continues bit-exactly.
    # ------------------------------------------------------------------

    def save_checkpoint(self, epoch):
        import flax.serialization

        if not self._is_writer:
            return
        # swap the 0-d device step scalar for its host mirror before the
        # fetch (scalar transfers can hang the tunnel — CLAUDE.md)
        st = self.state.replace(step=np.int32(self._host_step))
        payload = {"next_epoch": epoch + 1,
                   "state": flax.serialization.to_state_dict(
                       jax.device_get(st))}
        path = os.path.join(self.save_dir, CKPT_FILE)
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(flax.serialization.msgpack_serialize(payload))
        os.replace(tmp, path)

    def load_checkpoint(self):
        """Restore state from save_dir; returns the epoch to resume at
        (0 when no checkpoint exists)."""
        import flax.serialization

        path = os.path.join(self.save_dir, CKPT_FILE)
        if not os.path.isfile(path):
            return 0
        with open(path, "rb") as f:
            payload = flax.serialization.msgpack_restore(f.read())
        # coefs are a pure function of the CURRENT loss config, not training
        # state: always re-derive so a resume honors the hyperparameters
        # this Trainer was constructed with (= what specs.json records),
        # never the checkpointed ones. Matches pre-traced-coefs semantics,
        # where the resumed program baked the new values in as constants.
        # Also covers checkpoints predating the coefs vector.
        from disvae_tpu.ops.losses import coef_vector
        payload["state"]["coefs"] = np.asarray(coef_vector(self.loss_f))
        self.state = flax.serialization.from_state_dict(self.state,
                                                        payload["state"])
        # seed the host step mirror from the (host-side) msgpack payload
        self._host_step = int(payload["state"]["step"])
        self._start_epoch = int(payload["next_epoch"])
        self.logger.info("Resuming from checkpoint at epoch {}."
                         .format(self._start_epoch))
        return self._start_epoch

    def __call__(self, data_loader, epochs=10, checkpoint_every=10):
        start = default_timer()
        n_images = 0
        start_epoch = self._start_epoch
        if start_epoch and hasattr(data_loader, "_epoch"):
            # a resumed run must draw the SAME shuffles it would have seen:
            # the loader's permutation is keyed by (seed, epoch counter)
            data_loader._epoch = max(data_loader._epoch, start_epoch)

        # Fail fast BEFORE dispatching any work: the ragged-tail size is
        # static (len(dataset) mod batch regardless of shuffle), so the
        # tiny-tail contract violation (_skip_tiny_tail) is decidable here
        # — raising only when the tail batch is reached would waste a full
        # epoch of dispatched batches first.
        bs = getattr(data_loader, "batch_size", None)
        n_ds = len(getattr(data_loader, "dataset", []) or [])
        if (bs and n_ds and n_ds % bs == 1
                and not getattr(data_loader, "drop_last", False)
                and not self.skip_tiny_tail):
            self._skip_tiny_tail(1)  # raises for the affected losses

        # Preemption safety: on SIGTERM/SIGINT finish the current epoch,
        # write a full-state checkpoint, and stop — the run is then exactly
        # resumable with --resume. (The reference has no notion of this;
        # SURVEY.md section 5 'failure detection'.)
        import signal
        stop = {"flag": False}

        def _request_stop(signum, frame):
            self.logger.warning(
                "Signal %s received: checkpointing at epoch end.", signum)
            stop["flag"] = True

        old_handlers = {}
        for sig in (signal.SIGTERM, signal.SIGINT):
            try:
                old_handlers[sig] = signal.signal(sig, _request_stop)
            except ValueError:  # not in the main thread
                pass

        # Epoch pipelining (resident feed only): the profiler trace
        # (results/profile_e2e) shows the epoch's host span is ~95% blocked
        # in the metrics fetch — the device finishes the whole-epoch scan,
        # then the host pays a tunnel round-trip plus next-epoch permutation
        # prep while the chip idles. Deferring the fetch of epoch N until
        # epoch N+1 has been dispatched overlaps both with device compute;
        # the numbers are identical (same device arrays, fetched later).
        use_pipeline = self.pipeline_epochs and self._use_resident(data_loader)
        pending = None  # (epoch, device_metric rows, base_step), unfetched
        self._epoch_anchor = default_timer()

        def _log_epoch(p_epoch, mean_epoch_loss, storer):
            now = default_timer()
            epoch_dt = now - self._epoch_anchor
            self._epoch_anchor = now
            self.logger.info(
                "Epoch: {} Average loss per image: {:.2f} "
                "({:.0f} images/sec)".format(
                    p_epoch + 1, mean_epoch_loss,
                    len(data_loader.dataset) / max(epoch_dt, 1e-9)))
            if self.losses_logger is not None:
                self.losses_logger.log(p_epoch, storer)

        def _finish_epoch(pend):
            p_epoch, dm, bs = pend
            mean_epoch_loss, storer = self._reduce_epoch_metrics(dm, bs)
            _log_epoch(p_epoch, mean_epoch_loss, storer)

        for epoch in range(start_epoch, epochs):
            if use_pipeline:
                dm, bs = self._dispatch_epoch_resident(data_loader)
                if pending is not None:
                    _finish_epoch(pending)
                pending = (epoch, dm, bs)
            else:
                mean_epoch_loss, storer = self._train_epoch(data_loader,
                                                            epoch)
                pending = None
                _log_epoch(epoch, mean_epoch_loss, storer)
            n_images += len(data_loader.dataset)

            # Anything that fetches state (gif render, checkpoint) syncs the
            # pipeline anyway, and the CSV must stay ahead of checkpoints
            # (resume truncates rows >= the checkpoint epoch): flush first.
            if pending is not None and (
                    self.gif_visualizer is not None
                    or epoch % checkpoint_every == 0
                    or stop["flag"] or epoch == epochs - 1):
                _finish_epoch(pending)
                pending = None

            if self.gif_visualizer is not None:
                self.gif_visualizer(self.state.params)

            if epoch % checkpoint_every == 0:
                if self._is_writer:
                    save_model(self.model, self.state.params, self.save_dir,
                               filename="model-{}.npz".format(epoch))
                self.save_checkpoint(epoch)

            if stop["flag"]:
                if pending is not None:  # signal landed after the flush gate
                    _finish_epoch(pending)
                    pending = None
                self.save_checkpoint(epoch)
                self.logger.warning(
                    "Stopped by signal after epoch %d; resume with --resume.",
                    epoch)
                break

            if pending is None:
                # epoch timing starts fresh after synchronous end-of-epoch
                # work (gif render / checkpoint write)
                self._epoch_anchor = default_timer()

        if pending is not None:
            _finish_epoch(pending)

        for sig, h in old_handlers.items():
            # None = handler installed by non-Python code; restore the OS
            # default rather than leaving _request_stop (and its dead stop
            # flag) installed for the rest of an embedding process.
            signal.signal(sig, h if h is not None else signal.SIG_DFL)

        if self.gif_visualizer is not None:
            self.gif_visualizer.save_reset()

        delta_time = (default_timer() - start) / 60
        self.logger.info("Finished training after {:.1f} min.".format(
            delta_time))
        if delta_time > 0:
            self.logger.info("Throughput: {:.0f} images/sec.".format(
                n_images / (delta_time * 60)))

    def _get_padded_step(self):
        """Lazily built mask-aware step for padded ragged batches
        ((state, padded_batch, n_valid) -> (state, metrics))."""
        if self._padded_step is None:
            from disvae_tpu.train.steps import make_padded_train_step
            self._padded_step = make_padded_train_step(
                self.model, self.loss_f, self._optimizer, disc=self.disc,
                disc_optimizer=self._disc_optimizer, mesh=self.mesh,
                state=self.state)
        return self._padded_step

    def _skip_tiny_tail(self, true_n):
        """Handle a ragged final batch of ONE sample for the losses whose
        math is undefined there:

        * FactorVAE consumes two half-batches per step (reference
          losses.py:246-251); a tail of one has an empty half — the reference
          crashes on it, and the masked surrogate would 0/0 to NaN and
          silently poison the run.
        * btcvae with MSS: the importance weights use M = batch_size - 1
          (reference math.py:54-73), so a batch of one divides by zero — the
          reference raises on it, and the masked path
          (ops/math.py:log_importance_weight_matrix_masked) would otherwise
          produce finite non-parity values.

        Default (``skip_tiny_tail=False``) matches the reference's fail-fast
        contract: raise ValueError so a library caller cannot silently train
        on one fewer sample per epoch. With ``skip_tiny_tail=True`` (the CLI
        sets this) the batch is skipped with a warning instead.
        """
        if int(true_n) >= 2:
            return False
        if self.loss_f.needs_discriminator:
            why = ("FactorVAE needs two half-batches per step; a final "
                   "batch of {} sample(s) has an empty half (the reference "
                   "crashes here too)".format(int(true_n)))
        elif self.loss_f.name == "btcvae" and getattr(self.loss_f, "is_mss",
                                                      False):
            why = ("btcvae MSS importance weights are undefined for a "
                   "single sample (M = B-1 = 0; the reference errors on it)")
        else:
            return False
        fix = ("Pick a batch size with a tail of >= 2 (dataset mod batch) "
               "to train on every sample")
        if not self.skip_tiny_tail:
            raise ValueError(
                "{}. {}, or pass skip_tiny_tail=True to drop the tail "
                "batch with a warning.".format(why, fix))
        self.logger.warning("Skipping a final batch of %d sample(s): %s. "
                            "%s.", int(true_n), why, fix)
        return True

    def _n_dispatches(self, data_loader):
        """Number of items the prefetch iterator will yield for one epoch:
        full runs of K equal-shaped batches stack into one superbatch each,
        the remainder (and a ragged final batch) come through singly."""
        n_batches = len(data_loader)
        k = self.steps_per_dispatch
        if k <= 1:
            return n_batches
        n = len(getattr(data_loader, "dataset", []) or [])
        bs = getattr(data_loader, "batch_size", None)
        if self.mesh is not None and bs \
                and bs % int(self.mesh.shape["data"]):
            # every batch routes through the mask-aware padded step
            # (no superbatching) — see the warning in _train_epoch
            return n_batches
        ragged = bool(bs and n and n % bs
                      and not getattr(data_loader, "drop_last", False))
        n_full = n_batches - (1 if ragged else 0)
        return n_full // k + n_full % k + (1 if ragged else 0)

    # ------------------------------------------------------------------
    # HBM-resident feed
    # ------------------------------------------------------------------

    def _use_resident(self, data_loader):
        if self.resident_policy == "never":
            return False
        ds = getattr(data_loader, "dataset", None)
        if ds is not self._resident_ds:
            # (re)build for THIS dataset: the cached feed is keyed on the
            # dataset's identity, so a Trainer later driven with a different
            # loader never gathers the new epoch's indices out of the OLD
            # wire array (jnp.take would clip silently).
            self._resident_ds = ds
            self._resident = None
            if jax.process_count() > 1:  # replication needs one process
                return False
            from disvae_tpu.data.resident import (DEFAULT_LIMIT_BYTES,
                                                  ResidentData)
            limit = (float("inf") if self.resident_policy == "always"
                     else DEFAULT_LIMIT_BYTES)
            if ds is not None:
                self._resident = ResidentData.maybe(ds, mesh=self.mesh,
                                                    limit_bytes=limit)
            if self._resident is not None:
                self.logger.info(
                    "Using HBM-resident dataset feed (one transfer; epochs "
                    "ship only the permutation).")
        return self._resident is not None

    def _get_resident_step(self):
        if self._resident_step is None:
            from disvae_tpu.train.steps import make_resident_multi_train_step
            self._resident_step = make_resident_multi_train_step(
                self.model, self.loss_f, self._optimizer, disc=self.disc,
                disc_optimizer=self._disc_optimizer, mesh=self.mesh,
                state=self.state)
        return self._resident_step

    def _train_epoch_resident(self, data_loader, epoch):
        """One epoch fed from HBM, dispatch + fetch in one call (the
        pipelined __call__ loop uses the two halves directly so the fetch
        of epoch N overlaps the device compute of epoch N+1)."""
        device_metrics, base_step = self._dispatch_epoch_resident(data_loader)
        return self._reduce_epoch_metrics(device_metrics, base_step)

    def _dispatch_epoch_resident(self, data_loader):
        """Enqueue one epoch fed from HBM: one scan dispatch for all full
        batches (indices are the only host->device traffic), plus the usual
        single/padded step for a ragged tail. Batch order is identical to
        the streaming path (same DataLoader.epoch_order). Returns the
        UNFETCHED packed (n_rows, n_keys) device metrics (host copy already
        in flight — see _pack_metrics) and the base step counter; pass both
        to _reduce_epoch_metrics to realize the epoch's numbers. Dispatch
        is async — this returns as soon as XLA has queued the work, so the
        caller can overlap host work with the epoch."""
        import jax.numpy as jnp

        base_step = self._host_step
        wire = self._resident.wire
        B = data_loader.batch_size
        order = data_loader.epoch_order()
        n = len(order)
        if getattr(data_loader, "drop_last", False):
            n -= n % B
        n_full = n // B
        rem = n - n_full * B
        device_metrics = []

        if n_full:
            idx = jnp.asarray(order[:n_full * B].astype(np.int32)
                              .reshape(n_full, B))
            self.state, metrics = self._get_resident_step()(
                self.state, wire, idx)
            device_metrics.append(stack_metrics(metrics, self.metric_keys))

        if rem and self._skip_tiny_tail(rem):
            rem = 0
        if rem:
            if self._gather is None:
                if self.mesh is not None:
                    # the consuming steps declare P('data') batch input
                    # shardings and jit does not reshard committed args
                    from disvae_tpu.parallel.mesh import batch_sharding
                    self._gather = jax.jit(
                        lambda d, i: jnp.take(d, i, axis=0),
                        out_shardings=batch_sharding(self.mesh))
                else:
                    self._gather = jax.jit(
                        lambda d, i: jnp.take(d, i, axis=0))
            tail = order[n_full * B:].astype(np.int32)
            axis = int(self.mesh.shape["data"]) if self.mesh is not None \
                else 1
            if rem % axis:
                # pad by repeating the first index — identical semantics to
                # pad_to_multiple's repeat-first-row on the streaming path
                pad = axis - rem % axis
                tail = np.concatenate([tail, np.repeat(tail[:1], pad)])
                batch = self._gather(wire, jnp.asarray(tail))
                self.state, metrics = self._get_padded_step()(
                    self.state, batch, np.int32(rem))
            else:
                batch = self._gather(wire, jnp.asarray(tail))
                self.state, metrics = self._train_step(self.state, batch)
            device_metrics.append(
                stack_metrics(metrics, self.metric_keys))

        packed = _pack_metrics(device_metrics)
        self._host_step = base_step + \
            (0 if packed is None else packed.shape[0])
        return packed, base_step

    def _train_epoch(self, data_loader, epoch):
        """One epoch. Returns (mean loss over all steps, storer dict of means
        over recorded steps)."""
        import jax.numpy as jnp

        if self._use_resident(data_loader):
            return self._train_epoch_resident(data_loader, epoch)

        base_step = self._host_step
        device_metrics = []  # on-device (n_keys,) or (K, n_keys) rows

        sharding = super_sharding = None
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            from disvae_tpu.parallel.mesh import batch_sharding
            sharding = batch_sharding(self.mesh)
            super_sharding = NamedSharding(self.mesh, P(None, "data"))
        raw_before = getattr(data_loader, "raw", None)
        try:
            if raw_before is not None and hasattr(data_loader.dataset,
                                                  "get_batch_raw"):
                # feed wire-format uint8: 4x less host->device traffic; the
                # compiled step decompresses on device
                # (steps._decompress_batch)
                data_loader.raw = True
            pad_multiple = None
            if self.mesh is not None:
                # a ragged final batch must be padded up to the data-axis
                # size before the sharded device_put; the padded step keeps
                # the loss exact at the true size (ops/losses.py masks)
                pad_multiple = int(self.mesh.shape["data"])
                bs = getattr(data_loader, "batch_size", None)
                if bs and bs % pad_multiple and not self._warned_batch_pad:
                    self._warned_batch_pad = True
                    self.logger.warning(
                        "batch_size={} is not divisible by the data axis "
                        "({}): EVERY step takes the padded masked path and "
                        "K-step superbatching is disabled. Pick a batch "
                        "size divisible by {} for full throughput."
                        .format(bs, pad_multiple, pad_multiple))
            # _force_multihost: test hook — exercises the multi-host feed
            # branch in a single process (where local == global)
            multihost = jax.process_count() > 1 \
                or getattr(self, "_force_multihost", False)
            if multihost and pad_multiple is not None \
                    and getattr(data_loader, "host_slice", None) is not None \
                    and getattr(data_loader, "pad_global_to", None) is None:
                # SPMD feeding needs equal per-host shares of every global
                # batch (see DataLoader.pad_global_to); set it here so
                # library users who built the loader themselves get the
                # correct multi-host contract too. Re-apply the
                # constructor's divisibility check — a data axis smaller
                # than process_count (e.g. heavy --model-parallel) cannot
                # split into equal host shares and would silently drop rows.
                pn = data_loader.host_slice[1]
                if pad_multiple % pn:
                    raise ValueError(
                        "data axis ({}) must be divisible by process_count "
                        "({}) for multi-host feeding; lower --model-parallel"
                        .format(pad_multiple, pn))
                data_loader.pad_global_to = pad_multiple
            iterator = DevicePrefetcher(data_loader, sharding=sharding,
                                        superbatch_k=self.steps_per_dispatch,
                                        super_sharding=super_sharding,
                                        pad_multiple=pad_multiple,
                                        multihost=multihost)
            if self.is_progress_bar:
                from tqdm import tqdm
                iterator = tqdm(iterator, desc="Epoch {}".format(epoch + 1),
                                leave=False,
                                total=self._n_dispatches(data_loader))

            for batch, _ in iterator:
                if isinstance(batch, tuple):  # host-padded ragged batch
                    padded, true_n = batch
                    if self._skip_tiny_tail(true_n):
                        continue
                    self.state, metrics = self._get_padded_step()(
                        self.state, padded, np.int32(true_n))
                    device_metrics.append(
                        stack_metrics(metrics, self.metric_keys))
                    continue
                # single batches are (B, H, W, C) or bitpacked (B, n_bytes);
                # superbatches carry one extra leading K axis
                bits = batch.dtype == jnp.uint8 and batch.ndim in (2, 3)
                is_super = batch.ndim == (3 if bits else 5)
                if is_super:
                    self.state, metrics = self._multi_step(self.state, batch)
                else:
                    if self._skip_tiny_tail(batch.shape[0]):
                        continue
                    self.state, metrics = self._train_step(self.state, batch)
                device_metrics.append(
                    stack_metrics(metrics, self.metric_keys))
        finally:
            if raw_before is not None:
                data_loader.raw = raw_before

        packed = _pack_metrics(device_metrics)
        self._host_step = base_step + \
            (0 if packed is None else packed.shape[0])
        return self._reduce_epoch_metrics(packed, base_step)

    def _reduce_epoch_metrics(self, packed, base_step):
        """ONE device->host transfer per epoch (per-step metric fetches
        would pay the full host<->chip round-trip latency every iteration):
        fetch the dispatch-time-packed (n_rows, n_keys) array, apply the
        record-every-50 gate, return (mean epoch loss, storer of
        recorded-step means).

        The host step mirror is NOT touched here — dispatchers advance it
        from the (statically known) row shapes, so the reduce of epoch N
        may legally run after epoch N+1 was dispatched (__call__'s
        pipelined loop)."""
        if packed is None:
            return float("nan"), {}
        all_metrics = np.asarray(packed)
        steps = base_step + 1 + np.arange(all_metrics.shape[0])
        recorded = (steps % RECORD_LOSS_EVERY) == 1
        loss_idx = self.metric_keys.index("loss")
        mean_epoch_loss = float(all_metrics[:, loss_idx].mean())
        storer = {}
        if recorded.any():
            means = all_metrics[recorded].mean(axis=0)
            storer = {k: float(means[i])
                      for i, k in enumerate(self.metric_keys)}
        return mean_epoch_loss, storer


class LossesLogger:
    """CSV metric log, byte-compatible with the reference's
    `train_losses.log` (training.py:167-196): header `Epoch,Loss,Value`, one
    row per (epoch, key, mean-over-recorded-steps).

    `resume_from_epoch=None` (a fresh run) replaces any pre-existing file.
    With `resume_from_epoch=e`, rows with Epoch >= e are dropped so a run
    restarted from an older checkpoint never leaves duplicate Epoch rows in
    the load-bearing artifact the viz CLI parses back; e=0 (resume requested
    but no checkpoint found) degenerates to a fresh log."""

    def __init__(self, file_path_name, resume_from_epoch=None):
        self.path = file_path_name
        os.makedirs(os.path.dirname(file_path_name) or ".", exist_ok=True)
        if resume_from_epoch is not None and resume_from_epoch > 0 \
                and os.path.isfile(file_path_name):
            with open(file_path_name) as f:
                lines = f.readlines()
            kept = [ln for ln in lines[1:]
                    if ln.strip()
                    and int(ln.split(",", 1)[0]) < resume_from_epoch]
            with open(self.path, "w") as f:
                f.write("Epoch,Loss,Value\n")
                f.writelines(kept)
            return
        if os.path.isfile(file_path_name):
            os.remove(file_path_name)
        with open(self.path, "w") as f:
            f.write("Epoch,Loss,Value\n")

    def log(self, epoch, storer):
        with open(self.path, "a") as f:
            for k, v in storer.items():
                f.write("{},{},{}\n".format(epoch, k, v))
