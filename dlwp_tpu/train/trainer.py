"""jit-compiled training loop.

Replaces the reference's Keras ``fit``/``fit_generator`` path
(``DLWP/model/models.py:188-228``) and hand-written torch loop
(``models_torch.py:234-299``) with a single jitted optax train step:

- loss/optimizer/metrics are plain functions (optax + dlwp_tpu.ops.losses);
- multi-step ("sequence") training -- the reference's functional-API joint
  rollout loss (``DLWPFunctional``, models.py:319-465; sequence targets from
  generators.py:554-579) -- is a ``lax.scan`` rollout inside the loss with
  rematerialization, not a hand-built multi-output graph;
- early stopping with a minimum-epoch floor and best-weights restore mirrors
  ``EarlyStoppingMin`` (custom.py:99-136);
- data parallelism is a ``NamedSharding`` on the batch over a device mesh
  (vs. ``multi_gpu_model``, models.py:104-109).
"""

from __future__ import annotations

import dataclasses
import time
import warnings
import weakref
from typing import Any, Callable, Iterable

import numpy as np
import jax
import jax.numpy as jnp
import optax
import flax.linen as nn

from dlwp_tpu.ops import losses as loss_lib
from dlwp_tpu.utils.compile_safe import compile_forward_safe

OPTIMIZERS = {
    "adam": optax.adam,
    "adamw": optax.adamw,
    "sgd": optax.sgd,
    "rmsprop": optax.rmsprop,
    "adagrad": optax.adagrad,
    "lion": optax.lion,
}

LOSSES = {
    "mse": loss_lib.mse,
    "mae": loss_lib.mae,
    "mean_squared_error": loss_lib.mse,
    "mean_absolute_error": loss_lib.mae,
}


def resolve_loss(loss) -> Callable:
    if callable(loss):
        return loss
    try:
        return LOSSES[loss]
    except KeyError:
        raise ValueError(f"unknown loss {loss!r}") from None


def resolve_optimizer(optimizer, learning_rate=1e-3, **kwargs):
    if isinstance(optimizer, optax.GradientTransformation):
        return optimizer
    try:
        return OPTIMIZERS[optimizer](learning_rate, **kwargs)
    except KeyError:
        raise ValueError(f"unknown optimizer {optimizer!r}") from None


@dataclasses.dataclass
class TrainConfig:
    """Typed training configuration (replaces the reference's
    '#%% Parameters' constant blocks, SURVEY.md section 5.6)."""

    loss: Any = "mse"
    optimizer: Any = "adam"
    learning_rate: float = 1e-3
    weight_decay: float = 0.0  # l2; the reference used kernel_regularizer
    epochs: int = 10
    batch_size: int = 64
    shuffle: bool = True
    # Early stopping (reference EarlyStoppingMin, custom.py:99-136):
    early_stopping: bool = False
    min_epochs: int = 0
    patience: int = 0
    monitor: str = "val_loss"
    restore_best_weights: bool = True
    # Multi-step sequence training (reference DLWPFunctional):
    sequence_steps: int = 1
    # Validation-eval program form: 'forward' compiles the loss forward-
    # only as trained (loss inside the sequence scan); 'outer' moves the
    # per-step loss outside the scan over the stacked predictions (same
    # value, slightly more HBM); 'grad' computes it under value_and_grad
    # and discards the gradients (~3x the FLOPs). The alternatives exist
    # because the forward-only lowering of a sequence scan with a
    # WEIGHTED loss reduction inside deterministically faults the v5e
    # worker through the remote-PJRT stack, while the same loss outside
    # the scan, plain-MSE inside, value_and_grad form, and the train
    # step itself all run fine (benchmarks/probes/repro_eval_fault.py
    # bisect, BASELINE.md r4).
    eval_impl: str = "forward"
    seed: int = 0


class History:
    """Keras-History-like metric record (reference custom.py:71-91)."""

    def __init__(self):
        self.history: dict[str, list[float]] = {}
        self.epoch: list[int] = []

    def append(self, epoch: int, metrics: dict[str, float]):
        self.epoch.append(epoch)
        for k, v in metrics.items():
            self.history.setdefault(k, []).append(float(v))


class EarlyStoppingMin:
    """Early stopping with a minimum-epoch floor and best-weights restore.

    Stateful mirror of the reference's ``EarlyStoppingMin`` callback
    (custom.py:99-136): no stop before ``min_epochs``; stop after
    ``patience`` epochs without improvement; optionally restore the best
    parameters seen.
    """

    def __init__(self, monitor="val_loss", min_epochs=0, patience=0,
                 restore_best_weights=True, min_delta=0.0):
        self.monitor = monitor
        self.min_epochs = min_epochs
        self.patience = patience
        self.restore_best_weights = restore_best_weights
        self.min_delta = min_delta
        self.best = np.inf
        self.best_params = None
        self.wait = 0

    def update(self, epoch: int, metrics: dict[str, float], params):
        """Returns True if training should stop."""
        current = metrics.get(self.monitor)
        if current is None:
            return False
        if current < self.best - self.min_delta:
            self.best = current
            self.wait = 0
            if self.restore_best_weights:
                self.best_params = jax.tree.map(jnp.copy, params)
        else:
            self.wait += 1
        return epoch + 1 >= self.min_epochs and self.wait > self.patience


class Trainer:
    """Compiled training driver for a flax module.

    Args:
        model: flax module mapping input batch -> prediction.
        config: TrainConfig.
        splice_fn: for sequence training, maps (current_input, prediction,
            step_index) -> next input. Defaults to feeding the prediction
            straight back (requires model output shape == input shape). This
            is the in-graph analogue of the reference's
            ``TimeSeriesEstimator`` output->input splicing
            (extensions.py:244-253).
        mesh / batch_spec: optional jax Mesh + PartitionSpec for the batch
            axes; when given, batches are sharded for data parallelism.
    """

    def __init__(
        self,
        model: nn.Module,
        config: TrainConfig | None = None,
        splice_fn: Callable | None = None,
        mesh=None,
        batch_spec=None,
        target_spec=None,
        metrics: dict[str, Callable] | None = None,
    ):
        self.model = model
        self.config = config or TrainConfig()
        self.loss_fn = resolve_loss(self.config.loss)
        tx = resolve_optimizer(
            self.config.optimizer, self.config.learning_rate
        )
        if self.config.weight_decay:
            tx = optax.chain(
                optax.add_decayed_weights(self.config.weight_decay), tx
            )
        self.tx = tx
        self.splice_fn = splice_fn
        self.metrics = metrics or {}
        self.mesh = mesh
        self.batch_spec = batch_spec
        self._sharding = None
        self._target_sharding = None
        if mesh is not None and batch_spec is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            self._sharding = NamedSharding(mesh, batch_spec)
            if target_spec is None and self.config.sequence_steps > 1:
                # Sequence targets carry a step axis at position 1
                # (B, S, ...): shift the batch_spec's feature axes right so
                # e.g. P('data', None, 'lat') still lands 'lat' on latitude.
                parts = tuple(batch_spec)
                if len(parts) > 1:
                    target_spec = PartitionSpec(parts[0], None, *parts[1:])
            self._target_sharding = (
                NamedSharding(mesh, target_spec)
                if target_spec is not None
                else self._sharding
            )
        self.params = None
        self.opt_state = None
        self._warned_ragged = False
        self._warned_unsharded_axis = False
        self._jit_train_step = jax.jit(self._train_step, donate_argnums=(0, 1))
        self._jit_eval_step = jax.jit(self._eval_step)

    # ------------------------------------------------------------------ core
    def init(self, sample_x) -> Any:
        key = jax.random.PRNGKey(self.config.seed)
        self.params = self.model.init(key, sample_x)
        self.opt_state = self.tx.init(self.params)
        return self.params

    def _forward_loss(self, params, x, y):
        """Single- or multi-step loss.

        For ``sequence_steps > 1`` the target y must carry a step axis at
        position 1: (B, S, ...). The model is rolled out S times with
        ``splice_fn`` feeding predictions back, each step's loss averaged
        with equal weights (reference train_functional.py:283-285 uses equal
        loss weighting over the sequence).
        """
        S = self.config.sequence_steps
        apply = lambda inp: self.model.apply(params, inp)
        if S == 1:
            pred = apply(x)
            return self.loss_fn(y, pred), pred

        splice = self.splice_fn or (lambda inp, pred, k: pred)
        step_model = jax.checkpoint(apply)

        def body(carry, k_and_y):
            inp = carry
            k, y_k = k_and_y
            pred = step_model(inp)
            loss_k = self.loss_fn(y_k, pred)
            nxt = splice(inp, pred, k)
            return nxt, (loss_k, pred)

        ks = jnp.arange(S)
        y_steps = jnp.moveaxis(y, 1, 0)
        _, (losses, preds) = jax.lax.scan(body, x, (ks, y_steps))
        return jnp.mean(losses), jnp.moveaxis(preds, 0, 1)

    def _train_step(self, params, opt_state, x, y):
        (loss, pred), grads = jax.value_and_grad(
            lambda p: self._forward_loss(p, x, y), has_aux=True
        )(params)
        updates, opt_state = self.tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        out = {"loss": loss}
        for name, fn in self.metrics.items():
            out[name] = fn(y, pred)
        return params, opt_state, out

    def _forward_loss_outer(self, params, x, y):
        """Sequence loss with the per-step loss computed OUTSIDE the scan
        over the stacked predictions (same value as ``_forward_loss``; the
        scan body is apply+splice only). This is the forward-only program
        shape that avoids the v5e fault (see TrainConfig.eval_impl): the
        fault bisects to the *weighted loss reduction inside* a
        forward-only scan (repro_eval_fault.py stages 7 vs 8/9)."""
        S = self.config.sequence_steps
        if S == 1:
            pred = self.model.apply(params, x)
            return self.loss_fn(y, pred), pred
        splice = self.splice_fn or (lambda inp, pred, k: pred)

        def body(inp, k):
            pred = self.model.apply(params, inp)
            return splice(inp, pred, k), pred

        _, preds = jax.lax.scan(body, x, jnp.arange(S))
        y_steps = jnp.moveaxis(y, 1, 0)
        losses = jax.vmap(self.loss_fn)(y_steps, preds)
        return jnp.mean(losses), jnp.moveaxis(preds, 0, 1)

    def _eval_step(self, params, x, y):
        impl = self.config.eval_impl
        if impl == "grad":
            # Same loss under value_and_grad, gradients discarded: the
            # program shape that is known-good on hardware where the
            # forward-only sequence-scan lowering faults (see TrainConfig).
            # Routed through the shared compile_forward_safe wrapper so the
            # workaround has one implementation (utils/compile_safe.py).
            loss, pred = compile_forward_safe(
                lambda p: self._forward_loss(p, x, y)
            )(params)
        elif impl == "outer":
            loss, pred = self._forward_loss_outer(params, x, y)
        else:
            loss, pred = self._forward_loss(params, x, y)
        out = {"loss": loss}
        for name, fn in self.metrics.items():
            out[name] = fn(y, pred)
        return out

    def _compatible_sharding(self, sharding, shape):
        """Drop spec axes whose dimension does not divide the mesh axis
        (e.g. a 37-lat grid over 4 lat shards), warning once -- the model's
        spatial dispatch falls back consistently (SpatialSharding.shardable
        applies the same divisibility check)."""
        from jax.sharding import NamedSharding, PartitionSpec

        spec = tuple(sharding.spec)
        spec = spec + (None,) * (len(shape) - len(spec))
        fixed = []
        changed = False
        for dim, name in zip(shape, spec):
            n = self.mesh.shape.get(name, 1) if name is not None else 1
            if name is not None and dim % n:
                fixed.append(None)
                changed = True
            else:
                fixed.append(name)
        if not changed:
            return sharding
        if not self._warned_unsharded_axis:
            self._warned_unsharded_axis = True
            warnings.warn(
                f"array shape {tuple(shape)} does not divide the mesh along "
                f"spec {spec}; leaving the non-dividing axes unsharded",
                stacklevel=3,
            )
        return NamedSharding(self.mesh, PartitionSpec(*fixed))

    def _device_put(self, arr):
        if self._sharding is not None:
            return jax.device_put(
                arr, self._compatible_sharding(self._sharding, arr.shape)
            )
        return jnp.asarray(arr)

    def _device_put_target(self, arr):
        if self._target_sharding is not None:
            return jax.device_put(
                arr,
                self._compatible_sharding(self._target_sharding, arr.shape),
            )
        return jnp.asarray(arr)

    # ------------------------------------------------------------------ API
    def fit(
        self,
        x=None,
        y=None,
        generator: Iterable | None = None,
        validation_data=None,
        epochs: int | None = None,
        batch_size: int | None = None,
        verbose: bool = True,
        callbacks: list | None = None,
        checkpoint_dir: str | None = None,
        checkpoint_every: int = 1,
        resume: bool = False,
    ) -> History:
        """Train from arrays or a batch generator.

        ``generator`` must yield (x_batch, y_batch) and support len() /
        re-iteration per epoch (the reference's ``keras.utils.Sequence``
        protocol, generators.py:323-629). ``validation_data`` is (x, y)
        arrays or a generator.

        ``checkpoint_dir``: write an orbax checkpoint of {params, opt_state}
        every ``checkpoint_every`` epochs; with ``resume=True``, restore the
        latest checkpoint before training and continue from its epoch (the
        mid-training checkpoint/resume the reference lacks, SURVEY.md
        section 5.4).
        """
        cfg = self.config
        epochs = epochs or cfg.epochs
        batch_size = batch_size or cfg.batch_size
        history = History()
        stopper = (
            EarlyStoppingMin(
                cfg.monitor, cfg.min_epochs, cfg.patience,
                cfg.restore_best_weights,
            )
            if cfg.early_stopping
            else None
        )
        rng = np.random.RandomState(cfg.seed)

        # A device-resident sampler (on-device gather) gets the whole-epoch
        # jitted-scan driver when the per-batch-dispatch-only features are
        # not requested.
        if (
            generator is not None
            and hasattr(generator, "_gather_impl")
            and not any(hasattr(cb, "on_batch") for cb in callbacks or [])
        ):
            return self.fit_device(
                generator, epochs=epochs, verbose=verbose,
                callbacks=callbacks, validation_data=validation_data,
                checkpoint_dir=checkpoint_dir,
                checkpoint_every=checkpoint_every, resume=resume,
            )

        if self.params is None:
            if generator is not None:
                x0, _ = generator[0] if hasattr(generator, "__getitem__") else next(iter(generator))
            else:
                x0 = x[:1]
            # Init from a single (unsharded) sample: batch size 1 cannot be
            # sharded over the data axis. Device-resident batches stay on
            # device.
            if not isinstance(x0, jax.Array):
                x0 = jnp.asarray(np.asarray(x0))
            self.init(x0[:1])

        start_epoch = 0
        if checkpoint_dir and resume:
            from dlwp_tpu.train.checkpoint import restore_checkpoint

            try:
                state, meta = restore_checkpoint(
                    checkpoint_dir,
                    template={"params": self.params,
                              "opt_state": self.opt_state},
                )
                self.params = state["params"]
                self.opt_state = state["opt_state"]
                start_epoch = int(meta.get("epoch", -1)) + 1
                if verbose:
                    print(f"resumed from epoch {start_epoch}")
            except FileNotFoundError:
                pass

        n = None if x is None else len(x)
        for epoch in range(start_epoch, epochs):
            t0 = time.time()
            train_metrics: dict[str, list] = {}
            if generator is not None:
                epoch_iter = iter(generator)
            else:
                idx = np.arange(n)
                if cfg.shuffle:
                    rng.shuffle(idx)
                epoch_iter = (
                    (x[idx[i : i + batch_size]], y[idx[i : i + batch_size]])
                    for i in range(0, n, batch_size)
                )
            for xb, yb in epoch_iter:
                if self._sharding is not None:
                    # Data-parallel batches must tile the data axis; drop a
                    # ragged final batch (drop_remainder semantics).
                    n_shards = self.mesh.shape.get("data", 1)
                    if len(xb) % n_shards:
                        if not self._warned_ragged:
                            self._warned_ragged = True
                            warnings.warn(
                                f"dropping ragged batch of {len(xb)} samples "
                                f"not divisible by {n_shards} data shards; "
                                "pad the dataset or pick a divisible batch "
                                "size to train on every sample",
                                stacklevel=2,
                            )
                        continue
                # Batches that are already jax Arrays (e.g. the on-device
                # gathers of DeviceSeriesSampler) must NOT round-trip
                # through the host: device_put on a jax Array is an
                # on-device reshard (or a no-op when the layout matches).
                if not isinstance(xb, jax.Array):
                    xb = np.asarray(xb)
                if not isinstance(yb, jax.Array):
                    yb = np.asarray(yb)
                xb = self._device_put(xb)
                yb = self._device_put_target(yb)
                self.params, self.opt_state, m = self._jit_train_step(
                    self.params, self.opt_state, xb, yb
                )
                for k, v in m.items():
                    train_metrics.setdefault(k, []).append(v)
                for cb in callbacks or []:
                    # Per-batch hook (reference BatchHistory, custom.py:54).
                    if hasattr(cb, "on_batch"):
                        cb.on_batch(float(m["loss"]))
            metrics = {
                k: float(np.mean(jax.device_get(vs)))
                for k, vs in train_metrics.items()
            }
            if not np.isfinite(metrics.get("loss", 0.0)):
                # Numerical overflow guard (the reference only checks NaN in
                # data, run_barotropic.py:52-53; here training aborts and
                # surfaces the failure instead of burning epochs).
                print(
                    f"non-finite loss at epoch {epoch + 1}; stopping"
                )
                if (
                    stopper is not None
                    and stopper.restore_best_weights
                    and stopper.best_params is not None
                ):
                    self.params = stopper.best_params
                history.append(epoch, metrics)
                break
            if validation_data is not None:
                metrics.update(
                    {f"val_{k}": v for k, v in self.evaluate(
                        validation_data, batch_size=batch_size
                    ).items()}
                )
            metrics["time"] = time.time() - t0
            history.append(epoch, metrics)
            for cb in callbacks or []:
                cb(epoch, metrics, self.params)
            if checkpoint_dir and (epoch + 1) % checkpoint_every == 0:
                from dlwp_tpu.train.checkpoint import save_checkpoint

                save_checkpoint(
                    checkpoint_dir, self.params, self.opt_state,
                    step=epoch, metadata={"epoch": epoch, **metrics},
                )
            if verbose:
                desc = " ".join(
                    f"{k}={v:.6g}" for k, v in metrics.items()
                )
                print(f"epoch {epoch + 1}/{epochs}: {desc}")
            if stopper is not None and stopper.update(
                epoch, metrics, self.params
            ):
                if stopper.restore_best_weights and stopper.best_params is not None:
                    self.params = stopper.best_params
                if verbose:
                    print(f"early stopping at epoch {epoch + 1}")
                break
        return history

    def fit_device(
        self,
        sampler,
        epochs: int | None = None,
        verbose: bool = True,
        callbacks: list | None = None,
        validation_data=None,
        checkpoint_dir: str | None = None,
        checkpoint_every: int = 1,
        resume: bool = False,
    ) -> History:
        """Fully device-resident epoch driver (SURVEY.md section 3.1's
        endgame: "a jit'd scan over device-resident sharded arrays").

        ``sampler`` is a :class:`~dlwp_tpu.data.device_sampler.
        DeviceSeriesSampler`: the series lives in HBM and each epoch
        compiles to ONE ``lax.scan`` whose body gathers a batch on device
        and applies the train step. The only per-epoch host<->device
        traffic is the shuffled int32 index upload and the scalar metric
        download -- both explicit transfers, so the epoch runs clean under
        ``jax.transfer_guard('disallow')`` (asserted in tests). Contrast
        :meth:`fit`, which dispatches one train step per batch from Python
        (it also accepts device-resident batches without host copies, but
        pays per-batch dispatch).
        """
        cfg = self.config
        epochs = epochs or cfg.epochs
        history = History()
        stopper = (
            EarlyStoppingMin(
                cfg.monitor, cfg.min_epochs, cfg.patience,
                cfg.restore_best_weights,
            )
            if cfg.early_stopping
            else None
        )
        # Honor the wrapped SeriesSampler's own shuffle flag and RNG so a
        # device-resident sampler built over SeriesSampler(shuffle=False)
        # trains unshuffled and batch order matches the per-batch path for
        # the same sampler; fall back to the trainer config otherwise.
        base = getattr(sampler, "sampler", None)
        if base is not None and hasattr(base, "_shuffle"):
            do_shuffle = bool(base._shuffle)
            rng = base._rng
        else:
            do_shuffle = cfg.shuffle
            rng = np.random.RandomState(cfg.seed)
        if self.params is None:
            x0, _ = sampler[0]
            self.init(x0[:1])
        nb = len(sampler)
        if nb < 1:
            raise ValueError("sampler yields no full batches")
        bsz = sampler._batch
        n_used = nb * bsz  # drop_remainder, as in DeviceSeriesSampler
        gather = sampler._gather_impl
        train_step = self._train_step

        if not hasattr(self, "_device_epoch_fns"):
            # Weak keys: an id()-keyed dict could hand a NEW sampler the
            # stale epoch_fn of a collected one (whose closure is bound to
            # the old gather's static shapes/channel indices).
            self._device_epoch_fns = weakref.WeakKeyDictionary()
        epoch_fn = self._device_epoch_fns.get(sampler)
        if epoch_fn is None:
            # The HBM-resident series/insolation enter as jit PARAMETERS
            # (not closure captures): captured concrete arrays lower to
            # embedded constants, which at archive sizes overflows
            # remote-compile transports (HTTP 413 through the TPU tunnel).
            def _epoch(params, opt_state, idx, series, sol):
                def body(carry, samples):
                    p, o = carry
                    xb, yb = gather(samples, series, sol)
                    p, o, m = train_step(p, o, xb, yb)
                    return (p, o), m

                (params, opt_state), ms = jax.lax.scan(
                    body, (params, opt_state), idx
                )
                return params, opt_state, ms

            epoch_fn = jax.jit(_epoch, donate_argnums=(0, 1))
            self._device_epoch_fns[sampler] = epoch_fn

        start_epoch = 0
        if checkpoint_dir and resume:
            from dlwp_tpu.train.checkpoint import restore_checkpoint

            try:
                state, meta = restore_checkpoint(
                    checkpoint_dir,
                    template={"params": self.params,
                              "opt_state": self.opt_state},
                )
                self.params = state["params"]
                self.opt_state = state["opt_state"]
                start_epoch = int(meta.get("epoch", -1)) + 1
                if verbose:
                    print(f"resumed from epoch {start_epoch}")
            except FileNotFoundError:
                pass
        # Keep the shuffled index stream aligned with a resumed epoch count
        # so a resumed run sees the batch order the uninterrupted run would
        # have (the RNG state advances once per completed epoch).
        # Window starts the sampler may serve: the NaN-window pre-filtered
        # set when the series carries boundary markers, else every window.
        base_idx = np.asarray(sampler._index_pool, dtype=np.int32)
        if start_epoch and do_shuffle:
            skip = base_idx.copy()
            for _ in range(start_epoch):
                rng.shuffle(skip)
        for epoch in range(start_epoch, epochs):
            t0 = time.time()
            idx = base_idx.copy()
            if do_shuffle:
                rng.shuffle(idx)
            idx_dev = jax.device_put(idx[:n_used].reshape(nb, bsz))
            self.params, self.opt_state, ms = epoch_fn(
                self.params, self.opt_state, idx_dev,
                sampler._series, sampler._sol,
            )
            metrics = {
                k: float(np.mean(v)) for k, v in jax.device_get(ms).items()
            }
            if not np.isfinite(metrics.get("loss", 0.0)):
                print(f"non-finite loss at epoch {epoch + 1}; stopping")
                if (
                    stopper is not None
                    and stopper.restore_best_weights
                    and stopper.best_params is not None
                ):
                    self.params = stopper.best_params
                history.append(epoch, metrics)
                break
            if validation_data is not None:
                metrics.update(
                    {f"val_{k}": v for k, v in self.evaluate(
                        validation_data, batch_size=bsz
                    ).items()}
                )
            metrics["time"] = time.time() - t0
            history.append(epoch, metrics)
            for cb in callbacks or []:
                cb(epoch, metrics, self.params)
            if checkpoint_dir and (epoch + 1) % checkpoint_every == 0:
                from dlwp_tpu.train.checkpoint import save_checkpoint

                save_checkpoint(
                    checkpoint_dir, self.params, self.opt_state,
                    step=epoch, metadata={"epoch": epoch, **metrics},
                )
            if verbose:
                desc = " ".join(f"{k}={v:.6g}" for k, v in metrics.items())
                print(f"epoch {epoch + 1}/{epochs}: {desc}")
            if stopper is not None and stopper.update(
                epoch, metrics, self.params
            ):
                if stopper.restore_best_weights and stopper.best_params is not None:
                    self.params = stopper.best_params
                if verbose:
                    print(f"early stopping at epoch {epoch + 1}")
                break
        return history

    def evaluate(self, data, batch_size: int = 64) -> dict[str, float]:
        if isinstance(data, tuple):
            x, y = data
            n = len(x)
            batches = (
                (x[i : i + batch_size], y[i : i + batch_size])
                for i in range(0, n, batch_size)
            )
        else:
            batches = iter(data)
        out: dict[str, list] = {}
        for xb, yb in batches:
            if not isinstance(xb, jax.Array):
                xb = np.asarray(xb)
            if not isinstance(yb, jax.Array):
                yb = np.asarray(yb)
            m = self._jit_eval_step(
                self.params,
                self._device_put(xb),
                self._device_put_target(yb),
            )
            for k, v in m.items():
                out.setdefault(k, []).append(v)
        return {
            k: float(np.mean(jax.device_get(v))) for k, v in out.items()
        }

    def predict(self, x, batch_size: int = 64) -> np.ndarray:
        if not hasattr(self, "_jit_apply"):
            self._jit_apply = jax.jit(
                lambda p, inp: self.model.apply(p, inp)
            )
        apply = self._jit_apply
        outs = []
        for i in range(0, len(x), batch_size):
            outs.append(
                np.asarray(
                    apply(self.params, self._device_put(np.asarray(x[i : i + batch_size])))
                )
            )
        return np.concatenate(outs, axis=0)
