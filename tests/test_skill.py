"""End-to-end forecast-skill validation on a learnable synthetic system.

The reference's scientific correctness criterion is that a trained
model's rollout RMSE beats persistence (examples/validate.py:306-317;
SURVEY.md section 4 "skill verification as integration test"). This
distills that into a deterministic unit test: the dynamics are pure
zonal advection (roll by 2 longitude pixels per step), which a single
5-wide cyclic convolution can represent exactly -- so a correctly wired
build -> scale -> fit -> predict_timeseries -> verify pipeline must
produce near-zero forecast error while persistence error is O(field
variance).
"""

import numpy as np
import jax.numpy as jnp  # noqa: F401  (platform forced by conftest)

from dlwp_tpu.models import DLWPNeuralNet
from dlwp_tpu.forecast import verify


def _advecting_trajectory(T=160, H=16, W=32, seed=0):
    rng = np.random.RandomState(seed)
    base = rng.randn(H, W)
    for k in range(1, 5):  # smooth: band-limit the field
        base = base + np.roll(base, k, axis=-1) / 2
    traj = np.stack([np.roll(base, 2 * t, axis=-1) for t in range(T)])
    return traj[:, None].astype(np.float32)  # (T, 1, H, W)


def test_trained_forecast_beats_persistence():
    traj = _advecting_trajectory()
    x, y = traj[:-1], traj[1:]

    model = DLWPNeuralNet(time_dim=1, scaler_type="standard")
    model.build_model(
        [("CyclicConv2D", (1, 5), {"activation": "linear"})],
        loss="mse", learning_rate=0.05,
    )
    model.fit(x, y, epochs=40, batch_size=32, verbose=0)

    n_init, n_f = 8, 4
    fc = np.asarray(model.predict_timeseries(traj[:n_init], time_steps=n_f))
    valid = np.stack([traj[1 + t: n_init + 1 + t] for t in range(n_f)])
    f_err = verify.forecast_error(fc, valid)
    p_err = verify.persistence_error(
        traj[: n_init + n_f], traj[: n_init + n_f], n_f
    )
    # Leads beyond 0: the trained model must be far more skillful than
    # persistence (measured: ~1e-7 vs ~2-4 MSE).
    assert np.all(f_err < 1e-2), f_err
    assert np.all(f_err[: n_f - 1] < 1e-2 * p_err[1:]), (f_err, p_err)
