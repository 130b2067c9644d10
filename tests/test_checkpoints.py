"""Checkpoint round-trip tests: native .npz, reference-schema .tar
(including torch state_dict naming/layout contract), and resume semantics
(reference utils.py:174-214, 444-456)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_shared_tpu.models.nerf import NeRFConfig
from nerf_shared_tpu.train.state import create_train_state
from nerf_shared_tpu.utils import checkpoints as ckpt


def small_state(fine=True):
    ccfg = NeRFConfig(D=3, W=16, multires=4, multires_views=2, skips=(1,))
    return (
        create_train_state(
            jax.random.PRNGKey(0), ccfg, ccfg if fine else None, lrate=1e-3
        ),
        ccfg,
    )


def trees_equal(a, b, rtol=1e-6):
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=rtol)


class Args:
    def __init__(self, basedir, expname, ft_path=None, no_reload=False):
        self.basedir = basedir
        self.expname = expname
        self.ft_path = ft_path
        self.no_reload = no_reload


def _advance(state, n=3):
    """Take a few fake gradient steps so mu/nu are nonzero."""
    for _ in range(n):
        grads = jax.tree_util.tree_map(jnp.ones_like, state.params)
        state = state.apply_gradients(grads)
    return state


def test_native_roundtrip(tmp_path):
    state, _ = small_state()
    state = _advance(state)
    paths = ckpt.save_checkpoints(str(tmp_path), "exp", state, 3, fmt="native")
    assert paths[0].endswith("000003.ckpt.npz")

    fresh, _ = small_state()
    restored, start = ckpt.load_checkpoint(fresh, Args(str(tmp_path), "exp"))
    assert start == 3
    trees_equal(restored.params, state.params)
    trees_equal(restored.opt_state, state.opt_state)


def test_tar_roundtrip(tmp_path):
    state, _ = small_state()
    state = _advance(state)
    paths = ckpt.save_checkpoints(str(tmp_path), "exp", state, 5, fmt="tar")
    assert paths[0].endswith("000005.tar")

    fresh, _ = small_state()
    restored, start = ckpt.load_checkpoint(fresh, Args(str(tmp_path), "exp"))
    # the restored start is the saved global_step (reference utils.py:201),
    # not the filename iteration label
    assert start == int(state.step)
    trees_equal(restored.params, state.params, rtol=1e-6)
    trees_equal(restored.opt_state, state.opt_state, rtol=1e-6)


def test_load_frozen_has_zero_param_drift(tmp_path):
    """trainable=False (reference b_load_ckpnt_as_trainable,
    utils.py:206-212): gradient steps after a frozen load must leave the
    loaded params bit-identical."""
    state, _ = small_state()
    state = _advance(state)
    ckpt.save_checkpoints(str(tmp_path), "exp", state, 3, fmt="native")

    fresh, _ = small_state()
    frozen, start = ckpt.load_checkpoint(
        fresh, Args(str(tmp_path), "exp"), trainable=False
    )
    assert start == 3
    before = jax.device_get(frozen.params)
    stepped = _advance(frozen, n=2)
    for a, b in zip(jax.tree_util.tree_leaves(before),
                    jax.tree_util.tree_leaves(stepped.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # step counter still advances (only the params are frozen)
    assert int(stepped.step) == int(frozen.step) + 2


def test_tar_schema_matches_reference_contract(tmp_path):
    """The .tar must contain the reference's dict keys with torch state_dict
    naming ('pts_linears.0.weight', [out,in] layout) so the PyTorch reference
    can load it (reference utils.py:450-455, nerf.py:79-94)."""
    import torch

    state, ccfg = small_state()
    path = os.path.join(str(tmp_path), "000001.tar")
    ckpt.save_tar(
        path, jax.device_get(state.params),
        ckpt.adam_state_to_flat(jax.device_get(state.opt_state)), 1,
    )
    loaded = torch.load(path, map_location="cpu", weights_only=False)
    assert set(loaded.keys()) == {
        "global_step", "coarse_model_state_dict", "fine_model_state_dict",
        "optimizer_state_dict",
    }
    sd = loaded["coarse_model_state_dict"]
    assert "pts_linears.0.weight" in sd
    # torch layout [out, in]: first layer is input_ch(=27 at multires=4) -> 16
    assert tuple(sd["pts_linears.0.weight"].shape) == (16, 27)
    assert tuple(sd["pts_linears.0.bias"].shape) == (16,)
    assert "views_linears.0.weight" in sd
    assert "alpha_linear.weight" in sd and "rgb_linear.weight" in sd
    # values match the pytree (transposed)
    w = np.asarray(state.params["coarse"]["pts_linears"][0]["w"])
    np.testing.assert_allclose(sd["pts_linears.0.weight"].numpy(), w.T)
    # Adam param indexing covers both models
    n_params = len(sd) + len(loaded["fine_model_state_dict"])
    assert len(loaded["optimizer_state_dict"]["state"]) == n_params


def test_coarse_only_tar_does_not_crash(tmp_path):
    """Coarse-only checkpointing crashes the reference (utils.py:453); here
    it must produce a valid tar with an empty fine dict."""
    state, _ = small_state(fine=False)
    state = _advance(state, 2)
    paths = ckpt.save_checkpoints(str(tmp_path), "exp", state, 1, fmt="tar")
    fresh, _ = small_state(fine=False)
    restored, start = ckpt.load_checkpoint(fresh, Args(str(tmp_path), "exp"))
    assert start == 2
    trees_equal(restored.params, state.params)


def test_newest_wins_and_no_reload(tmp_path):
    state, _ = small_state()
    ckpt.save_checkpoints(str(tmp_path), "exp", state, 1, fmt="native")
    state2 = _advance(state, 2)
    ckpt.save_checkpoints(str(tmp_path), "exp", state2, 2, fmt="native")

    fresh, _ = small_state()
    restored, start = ckpt.load_checkpoint(fresh, Args(str(tmp_path), "exp"))
    assert start == int(state2.step)
    trees_equal(restored.params, state2.params)

    same, start0 = ckpt.load_checkpoint(
        fresh, Args(str(tmp_path), "exp", no_reload=True)
    )
    assert start0 == 0
    trees_equal(same.params, fresh.params)


def test_ft_path_override(tmp_path):
    state, _ = small_state()
    state = _advance(state, 4)
    pa = ckpt.save_checkpoints(str(tmp_path), "expA", state, 7, fmt="native")
    state2 = _advance(state)
    ckpt.save_checkpoints(str(tmp_path), "expB", state2, 9, fmt="native")

    fresh, _ = small_state()
    restored, start = ckpt.load_checkpoint(
        fresh, Args(str(tmp_path), "expB", ft_path=pa[0])
    )
    assert start == 4
    trees_equal(restored.params, state.params)


def test_resume_continues_training(tmp_path):
    """Save -> restore -> further optimizer steps behave identically to an
    uninterrupted run (checkpoint/resume contract, SURVEY.md §5)."""
    state, _ = small_state()
    state = _advance(state, 2)
    ckpt.save_checkpoints(str(tmp_path), "exp", state, 2, fmt="both")

    cont = _advance(state, 3)

    fresh, _ = small_state()
    restored, _ = ckpt.load_checkpoint(fresh, Args(str(tmp_path), "exp"))
    resumed = _advance(restored, 3)
    trees_equal(cont.params, resumed.params, rtol=1e-5)


def test_ema_sidecar_roundtrip(tmp_path):
    """--ema_decay: the EMA shadow rides the native checkpoint as an ema/
    sidecar; load_checkpoint restores it into a marked aux_state slot, and
    restarts the shadow at the loaded params for pre-EMA files."""
    state, _ = small_state()
    state = _advance(state)
    shadow = {k: jax.tree_util.tree_map(lambda x: x * 0.5 + 0.1,
                                        state.params[k])
              for k in ("coarse", "fine")}
    state = state.replace(aux_state={"ema": shadow})
    args = Args(str(tmp_path), "exp")
    ckpt.save_checkpoints(args.basedir, args.expname, state, i=7, fmt="native")

    # sidecar readable standalone
    p = os.path.join(str(tmp_path), "exp", "000007.ckpt.npz")
    got = ckpt.load_native_ema(p)
    trees_equal(got, shadow)

    # marked fresh state restores the sidecar
    fresh, _ = small_state()
    fresh = fresh.replace(aux_state={"ema": {
        k: jax.tree_util.tree_map(jnp.copy, fresh.params[k])
        for k in ("coarse", "fine")}})
    loaded, start = ckpt.load_checkpoint(fresh, args)
    assert start == 3  # the saved global_step (3 fake steps), not the filename index
    trees_equal(loaded.aux_state["ema"], shadow)
    trees_equal(loaded.params, state.params)

    # unmarked state ignores the sidecar entirely
    plain, _ = small_state()
    loaded2, _ = ckpt.load_checkpoint(plain, args)
    assert loaded2.aux_state is None

    # pre-EMA checkpoint + marked state: shadow restarts at loaded params
    state2, _ = small_state()
    state2 = _advance(state2, n=5)
    args2 = Args(str(tmp_path), "exp2")
    ckpt.save_checkpoints(args2.basedir, args2.expname, state2, i=3, fmt="native")
    fresh2, _ = small_state()
    fresh2 = fresh2.replace(aux_state={"ema": {
        k: jax.tree_util.tree_map(jnp.copy, fresh2.params[k])
        for k in ("coarse", "fine")}})
    loaded3, _ = ckpt.load_checkpoint(fresh2, args2)
    trees_equal(loaded3.aux_state["ema"], loaded3.params)
