"""Small parity pieces: Encoding op, resize wrapper, collect_env, DropPath."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp


def test_encoding_layer_matches_numpy_reference():
    from cp2_tpu.models.utils import Encoding

    enc = Encoding(channels=8, num_codes=4)
    x = jnp.asarray(np.random.RandomState(0).rand(2, 3, 3, 8).astype(np.float32))
    params = enc.init(jax.random.PRNGKey(0), x)
    out = np.asarray(enc.apply(params, x))
    assert out.shape == (2, 4, 8)

    # numpy reference of the residual-encoding law
    cw = np.asarray(params["params"]["codewords"])  # (K, C)
    sc = np.asarray(params["params"]["scale"])      # (K,)
    feats = np.asarray(x).reshape(2, -1, 8)          # (N, P, C)
    resid = feats[:, :, None, :] - cw[None, None]    # (N, P, K, C)
    dist = (resid**2).sum(-1)                        # (N, P, K)
    e = np.exp(sc[None, None] * dist)
    assign = e / e.sum(-1, keepdims=True)
    ref = (assign[..., None] * resid).sum(1)         # (N, K, C)
    np.testing.assert_allclose(out, ref, rtol=1e-3, atol=2e-3)


def test_resize_wrapper_modes():
    from cp2_tpu.ops.resize import resize, upsample

    x = jnp.asarray(np.random.RandomState(0).rand(1, 4, 4, 2).astype(np.float32))
    assert resize(x, (8, 8)).shape == (1, 8, 8, 2)
    assert resize(x, scale_factor=2.0).shape == (1, 8, 8, 2)
    up = upsample(x, 2, "nearest")
    assert up.shape == (1, 8, 8, 2)
    np.testing.assert_allclose(np.asarray(up[0, 0, 0]), np.asarray(x[0, 0, 0]))


def test_collect_env_reports_jax():
    from cp2_tpu.utils.logging import collect_env

    info = collect_env()
    assert "JAX" in info and "Python" in info


def test_drop_path_train_vs_eval():
    from cp2_tpu.models.utils import DropPath

    dp = DropPath(rate=0.5)
    x = jnp.ones((64, 4))
    v = dp.init({"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
                x, train=True)
    out_eval = dp.apply(v, x, train=False)
    np.testing.assert_allclose(np.asarray(out_eval), np.asarray(x))
    out_train = dp.apply(v, x, train=True, rngs={"dropout": jax.random.PRNGKey(2)})
    kept = np.asarray(out_train)[:, 0]
    assert set(np.round(np.unique(kept), 4)) <= {0.0, 2.0}  # dropped or rescaled
    assert 0.2 < (kept > 0).mean() < 0.8
