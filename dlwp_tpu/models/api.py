"""High-level model wrapper: the reference's ``DLWPNeuralNet`` API surface.

Mirrors ``DLWP/model/models.py:21-316`` (and folds in the multi-output
sequence training of ``DLWPFunctional``, models.py:319-465, via
``sequence_steps``): declarative layer-spec construction, optional feature
scaling/imputation, fit/fit_generator/predict/evaluate, and the
autoregressive ``predict_timeseries`` rollout -- with the compute re-designed
for TPU: the model is a flax module, training is a jitted optax step
(:mod:`dlwp_tpu.train.trainer`), and the rollout runs as one on-device
``lax.scan`` instead of a host loop of ``model.predict`` calls
(models.py:277-301).
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from dlwp_tpu.models.cnn import build_sequential
from dlwp_tpu.train.trainer import TrainConfig, Trainer
from dlwp_tpu.utils.scaler import SCALERS, MeanImputer


def shape_series(ts, time_dim, feature_shape, step_sequence=False,
                 keep_time_dim=False):
    """Apply the reference's rollout output-shaping rules (models.py:277-301)
    to a raw prediction series of shape ``(n_iter, batch) + ...``.

    Pure host-side shape manipulation (views where possible), shared by
    :meth:`DLWPNeuralNet.predict_timeseries` and exported servables
    (:mod:`dlwp_tpu.serve`).
    """
    ts = np.asarray(ts)
    n_iter, b = ts.shape[:2]
    td = time_dim
    ts = ts.reshape((n_iter, b, td, -1) + tuple(feature_shape[1:]))
    if not keep_time_dim:
        if step_sequence:
            ts = ts[:, :, 0]
        else:
            ts = ts.transpose(
                (0, 2, 1) + tuple(range(3, 3 + len(feature_shape)))
            )
            ts = ts.reshape((n_iter * td, b, -1) + tuple(feature_shape[1:]))
    return ts


class DLWPNeuralNet:
    """DLWP neural-net wrapper (reference models.py:21).

    Args:
        is_convolutional / is_recurrent: input-shape handling flags, as in
            the reference (models.py:34-45). Recurrent models take
            (B, time_dim, C, H, W); convolutional ones (B, time_dim*C, H, W).
        time_dim: number of input/output time steps stacked in the channel
            (or time) dimension.
        scaler_type: 'standard' | 'minmax' | None.
        scale_targets: inverse-transform predictions (models.py:242-243).
        impute_missing: NaN imputation with per-feature means.
    """

    def __init__(
        self,
        is_convolutional: bool = True,
        is_recurrent: bool = False,
        time_dim: int = 1,
        scaler_type: str | None = "standard",
        scale_targets: bool = True,
        impute_missing: bool = False,
    ):
        self.is_convolutional = is_convolutional
        self.is_recurrent = is_recurrent
        self.time_dim = time_dim
        self.scaler_type = scaler_type
        self.scale_targets = scale_targets
        self.impute = impute_missing
        self.scaler = None
        self.scaler_y = None
        self.imputer = None
        self.layer_specs: Sequence | None = None
        self.base_model = None  # flax module
        self.trainer: Trainer | None = None
        self._params = None
        self._train_config: TrainConfig | None = None
        self._sample_shape: tuple | None = None

    # ------------------------------------------------------------- building
    def build_model(
        self,
        layers: Sequence,
        loss: Any = "mse",
        optimizer: Any = "adam",
        learning_rate: float = 1e-3,
        weight_decay: float = 0.0,
        metrics: dict[str, Callable] | None = None,
        sequence_steps: int = 1,
        splice_fn: Callable | None = None,
        mesh=None,
        batch_spec=None,
        target_spec=None,
        spatial_impl: str = "ppermute",
        **train_kwargs,
    ) -> None:
        """Build the flax model from layer specs and set up training.

        ``layers`` is a list of flax modules and/or reference-style
        ``(name, args, kwargs)`` tuples (models.py:63-103 semantics).

        ``mesh``/``batch_spec`` enable distributed training (the integrated
        analogue of the reference's ``multi_gpu_model`` path,
        models.py:104-109): a batch_spec of ``P('data')`` gives data
        parallelism; one like ``P('data', None, 'lat', None)`` additionally
        shards latitude bands and switches every spherical conv onto the
        explicit halo-exchange path (``spatial_impl``: 'ppermute' XLA
        collectives, or 'pallas' ICI remote DMA).
        """
        self.layer_specs = layers
        spatial = None
        if mesh is not None and batch_spec is not None:
            lat_axes = [
                a for a in tuple(batch_spec)[1:]
                if a is not None and mesh.shape.get(a, 1) > 1
            ]
            if lat_axes:
                from dlwp_tpu.parallel.spatial import SpatialSharding

                data_axis = tuple(batch_spec)[0]
                spatial = SpatialSharding(
                    mesh=mesh,
                    data_axis=data_axis,
                    lat_axis=lat_axes[0],
                    # A second sharded feature axis is the longitude tile
                    # axis (2-D lat x lon decomposition, cyclic lon ring).
                    lon_axis=lat_axes[1] if len(lat_axes) > 1 else None,
                    impl=spatial_impl,
                )
        self._spatial = spatial
        self.base_model = build_sequential(layers, spatial=spatial)
        self._train_config = TrainConfig(
            loss=loss,
            optimizer=optimizer,
            learning_rate=learning_rate,
            weight_decay=weight_decay,
            sequence_steps=sequence_steps,
            **train_kwargs,
        )
        self.trainer = Trainer(
            self.base_model,
            self._train_config,
            splice_fn=splice_fn,
            mesh=mesh,
            batch_spec=batch_spec,
            target_spec=target_spec,
            metrics=metrics,
        )

    @property
    def model(self):
        return self.base_model

    # ------------------------------------------------------------- scaling
    def scaler_fit(self, X, y=None, **kwargs):
        scaler_cls = SCALERS[self.scaler_type]
        if scaler_cls is None:
            return self
        self.scaler = scaler_cls(**kwargs).fit(X)
        if y is not None:
            self.scaler_y = scaler_cls(**kwargs).fit(y)
        else:
            self.scaler_y = self.scaler
        return self

    def scaler_transform(self, X, y=None):
        if self.scaler is None:
            return X if y is None else (X, y)
        Xs = self.scaler.transform(X)
        if y is None:
            return Xs
        return Xs, self.scaler_y.transform(y)

    def imputer_fit(self, X):
        self.imputer = MeanImputer().fit(X)
        return self

    def imputer_transform(self, X, y=None):
        if self.imputer is None:
            return X if y is None else (X, y)
        Xi = self.imputer.transform(X)
        if y is None:
            return Xi
        return Xi, self.imputer.transform(y)

    # ------------------------------------------------------------- training
    def init_fit(self, predictors, targets):
        """Fit scaler/imputer prior to training (models.py:172-186)."""
        if self.impute:
            self.imputer_fit(predictors)
            predictors = self.imputer_transform(predictors)
        self.scaler_fit(predictors, targets)
        return self

    def fit(self, predictors, targets, validation_data=None, **kwargs):
        """Train on arrays (models.py:188-214 semantics + scaling)."""
        if self.impute:
            predictors, targets = self.imputer_transform(predictors, targets)
        x, y = self.scaler_transform(predictors, targets)
        self._sample_shape = tuple(np.shape(x)[1:])
        if validation_data is not None:
            val = validation_data
            if self.impute:
                val = self.imputer_transform(*val)
            val = self.scaler_transform(*val)
        else:
            val = None
        return self.trainer.fit(x=x, y=y, validation_data=val, **kwargs)

    def fit_generator(self, generator, validation_data=None, **kwargs):
        """Train from a batch generator (models.py:216-228). The generator
        is expected to yield already-scaled batches (as the reference's
        SeriesDataGenerator does)."""
        shape = getattr(generator, "convolution_shape", None)
        if shape is not None:
            self._sample_shape = tuple(shape)
        return self.trainer.fit(
            generator=generator, validation_data=validation_data, **kwargs
        )

    @property
    def input_sample_shape(self) -> tuple | None:
        """Per-sample input feature shape seen at fit time (None before
        training). Persisted with the model; lets downstream tooling (e.g.
        ``examples/validate.py``) rebuild a matching sampler -- notably
        whether the trained inputs carried an insolation channel, which the
        reference leaves to the user to re-specify by hand
        (reference validate.py:191-194)."""
        return self._sample_shape

    # ------------------------------------------------------------ inference
    def predict(self, predictors, **kwargs):
        """Predict with scaling + inverse target scaling (models.py:230)."""
        if self.impute:
            predictors = self.imputer_transform(predictors)
        x = self.scaler_transform(predictors)
        pred = self.trainer.predict(x, **kwargs)
        if self.scale_targets and self.scaler_type is not None and self.scaler_y is not None:
            return self.scaler_y.inverse_transform(pred)
        return pred

    def rollout_fn(self, time_steps: int, step_sequence: bool = False):
        """Build the jittable autoregressive rollout (models.py:247-301).

        Returns ``(fn, n_iter)``: ``fn`` maps a (scaled) predictor batch to
        the raw prediction series ``(n_iter, batch, ...)`` as a single
        ``lax.scan``; per scan step the model predicts and either the whole
        state is replaced by the prediction (default) or a sliding window
        advances one time step (``step_sequence``, models.py:280-290).

        The function closes over the trained parameters, and every shape it
        computes derives from ``x.shape`` at trace time -- so it is
        batch-symbolic-shape friendly and can be AOT-exported for serving
        (:mod:`dlwp_tpu.serve`).
        """
        time_steps = int(time_steps)
        if time_steps < 1:
            raise ValueError("time_steps must be an int > 0")
        n_iter = (
            time_steps
            if step_sequence
            else int(np.ceil(time_steps / self.time_dim))
        )
        if self.trainer is None or self.trainer.params is None:
            raise ValueError(
                "model has no parameters yet; call fit()/init_fit() or "
                "trainer.init(sample) before building a rollout"
            )
        td = self.time_dim
        is_recurrent = self.is_recurrent
        params = self.trainer.params
        apply = self.trainer.model.apply

        def scan_body(p, _):
            pred = apply(params, p)
            if step_sequence:
                if is_recurrent:
                    p_next = jnp.concatenate([p[:, 1:], pred[:, :1]], axis=1)
                else:
                    b = p.shape[0]
                    pr = pred.reshape(
                        (b, td, pred.shape[1] // td) + pred.shape[2:]
                    )
                    pt = p.reshape((b, td, p.shape[1] // td) + p.shape[2:])
                    p_next = jnp.concatenate([pt[:, 1:], pr[:, :1]], axis=1)
                    p_next = p_next.reshape(p.shape)
                return p_next, pred
            return pred, pred

        def fn(x):
            _, series = jax.lax.scan(scan_body, x, None, length=n_iter)
            return series

        return fn, n_iter

    def predict_timeseries(
        self,
        predictors,
        time_steps: int,
        step_sequence: bool = False,
        keep_time_dim: bool = False,
        **kwargs,
    ):
        """Autoregressive rollout (reference models.py:247-301).

        Runs entirely on device as a ``lax.scan`` (:meth:`rollout_fn`).
        Returns (time_steps[, time_dim], sample, ...) exactly per the
        reference's output-shaping rules.
        """
        if self.impute:
            predictors = self.imputer_transform(predictors)
        x0 = self.scaler_transform(np.asarray(predictors))
        # Shard the rollout state like a training batch (dp x sp rollout).
        x0 = self.trainer._device_put(np.asarray(x0))
        feature_shape = x0.shape[2:] if self.is_recurrent else x0.shape[1:]
        fn, _ = self.rollout_fn(time_steps, step_sequence)
        ts = np.asarray(jax.jit(fn)(x0))  # (n_iter, B, ...)
        if self.scale_targets and self.scaler_type is not None and self.scaler_y is not None:
            ts = self.scaler_y.inverse_transform(ts)
        return shape_series(
            ts, self.time_dim, feature_shape, step_sequence, keep_time_dim
        )

    def evaluate(self, predictors, targets, **kwargs):
        """Scaled evaluation (models.py:303-316)."""
        if self.impute:
            predictors, targets = self.imputer_transform(predictors, targets)
        x, y = self.scaler_transform(predictors, targets)
        return self.trainer.evaluate((x, y), **kwargs)

    # -------------------------------------------------------- persistence
    _UNPICKLABLE = "<<unpicklable>>"

    def __getstate__(self):
        import dataclasses
        import pickle as _pickle

        state = dict(self.__dict__)
        # Bake activation defaults that affect trained-weight semantics into
        # the saved specs: a later change to ConvLSTM2D's
        # recurrent_activation default must not silently rebuild an old
        # model with different gates than it trained with.
        specs = state.get("layer_specs")
        if specs is not None:
            baked = []
            for spec in specs:
                if (
                    not isinstance(spec, (list, tuple))
                    or len(spec) != 3
                    or spec[0] != "ConvLSTM2D"
                ):
                    baked.append(spec)
                    continue
                name, args, kwargs = spec
                kwargs = dict(kwargs or {})
                if "recurrent_activation" not in kwargs:
                    from dlwp_tpu.models.layers import ConvLSTM2D

                    kwargs["recurrent_activation"] = ConvLSTM2D.recurrent_activation
                baked.append((name, args, kwargs))
            state["layer_specs"] = type(specs)(baked) if isinstance(
                specs, (list, tuple)
            ) else baked
        # flax modules / trainer are rebuilt from specs on load (analogue of
        # nulling Keras objects before pickling, util.py:143-147).
        state["_params"] = self.trainer.params if self.trainer else self._params
        state.pop("base_model", None)
        state.pop("trainer", None)
        # Callable loss/optimizer objects (closures like
        # latitude_weighted_loss, optax.chain transforms with local
        # functions) are not picklable; replace them with a sentinel so the
        # saved file stays loadable for inference (the reference likewise
        # nulls compile-time Keras objects). Reload warns and falls back to
        # defaults; pass loss/optimizer to build_model again to resume
        # training with the original schedule.
        cfg = state.get("_train_config")
        if cfg is not None:
            repl = {}
            for field in ("loss", "optimizer"):
                v = getattr(cfg, field)
                try:
                    _pickle.dumps(v)
                except Exception:
                    repl[field] = self._UNPICKLABLE
            if repl:
                state["_train_config"] = dataclasses.replace(cfg, **repl)
        return state

    def __setstate__(self, state):
        import dataclasses
        import warnings

        self._params = state.pop("_params", None)
        self._sample_shape = state.pop("_sample_shape", None)
        self.__dict__.update(state)
        self.base_model = None
        self.trainer = None
        if self.layer_specs is not None:
            self.base_model = build_sequential(self.layer_specs)
            cfg = self._train_config or TrainConfig()
            repl = {
                field: default
                for field, default in (("loss", "mse"), ("optimizer", "adam"))
                if getattr(cfg, field, None) == self._UNPICKLABLE
            }
            if repl:
                warnings.warn(
                    f"saved model used non-picklable {sorted(repl)}; "
                    f"restored with defaults {repl} -- inference is exact, "
                    "but to resume training with the original loss/schedule "
                    "pass them to build_model again",
                    stacklevel=2,
                )
                cfg = dataclasses.replace(cfg, **repl)
                self._train_config = cfg
            self.trainer = Trainer(self.base_model, cfg)
            self.trainer.params = self._params


class DLWPFunctional(DLWPNeuralNet):
    """Multi-step ("functional") model API (reference ``DLWPFunctional``,
    models.py:319-465).

    The reference builds a Keras functional graph whose multiple outputs are
    successive rollout steps trained jointly (``_n_steps =
    len(model.outputs)``, models.py:364). Here the same capability is the
    single flax model trained with ``sequence_steps`` rollout loss
    (Trainer._forward_loss); this subclass pins the reference's conventions:
    no scaling/imputing (models.py:321-322) and sequence training on by
    default.
    """

    def __init__(self, is_convolutional=True, is_recurrent=False, time_dim=1):
        super().__init__(
            is_convolutional=is_convolutional,
            is_recurrent=is_recurrent,
            time_dim=time_dim,
            scaler_type=None,
            impute_missing=False,
        )
        self._n_steps = 1

    def build_model(self, layers, sequence_steps: int = 2, **kwargs):
        super().build_model(layers, sequence_steps=sequence_steps, **kwargs)
        self._n_steps = sequence_steps

    def predict_sequence(self, predictors, **kwargs):
        """One model call per ``_n_steps`` future states (the reference's
        multi-output predict, models.py:414-452): returns
        (n_steps * time_dim, sample, ...) by rolling the model."""
        return self.predict_timeseries(
            predictors, self._n_steps * self.time_dim, **kwargs
        )
