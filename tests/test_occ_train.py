"""Occupancy-gated training (train/occ_train.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_shared_tpu.models.nerf import NeRFConfig
from nerf_shared_tpu.render.occupancy import OccupancyGrid
from nerf_shared_tpu.render.renderer import RenderConfig
from nerf_shared_tpu.train import occ_train as OT
from nerf_shared_tpu.train.pipeline import PixelSamplerSpec
from nerf_shared_tpu.train.state import create_train_state


def _rcfg(**kw):
    base = dict(N_samples=8, N_importance=0, near=2.0, far=6.0,
                use_viewdirs=True, white_bkgd=True, perturb=1.0)
    base.update(kw)
    return RenderConfig(**base)


def test_random_k_selection_properties():
    """Selected depths are a depth-ordered subset of the occupied
    candidates; count = min(K, #occupied); padding = far."""
    rng = np.random.default_rng(0)
    R, C, K = 64, 24, 8
    z = np.sort(rng.uniform(2, 6, (R, C)), axis=-1).astype(np.float32)
    occ = rng.random((R, C)) < 0.4
    occ[0] = False                      # an all-empty ray
    occ[1] = True                       # an all-occupied ray
    far = jnp.full((R, 1), 6.0)
    z_sel, valid = OT._random_k_of_occupied(
        jax.random.PRNGKey(0), jnp.asarray(z), jnp.asarray(occ), K, far
    )
    z_sel, valid = np.asarray(z_sel), np.asarray(valid)
    for r in range(R):
        n = valid[r].sum()
        assert n == min(K, occ[r].sum()), r
        sel = z_sel[r][valid[r]]
        assert (np.diff(sel) > 0).all(), r           # depth-ordered
        occupied_zs = set(z[r][occ[r]].tolist())
        assert all(v in occupied_zs for v in sel.tolist()), r
        assert (z_sel[r][~valid[r]] == 6.0).all(), r


def test_random_selection_covers_far_candidates():
    """With everything occupied (the warmup state), selection must not
    collapse to the nearest-K prefix — far candidates must be drawn too
    (this is what prevents the never-see-the-scene deadlock)."""
    R, C, K = 256, 32, 8
    z = jnp.broadcast_to(jnp.linspace(2.0, 6.0, C), (R, C))
    occ = jnp.ones((R, C), bool)
    far = jnp.full((R, 1), 6.0)
    z_sel, valid = OT._random_k_of_occupied(
        jax.random.PRNGKey(1), z, occ, K, far
    )
    assert bool(valid.all())
    assert float(jnp.max(z_sel)) > 5.5   # far half gets sampled
    assert float(jnp.mean(z_sel)) == jax.numpy.clip(
        float(jnp.mean(z_sel)), 3.5, 4.5)  # roughly uniform over [2, 6]


def test_density_grid_init_and_binarize():
    dg = OT.init_density_grid(np.array([-1.0, -1, -1]),
                              np.array([1.0, 1, 1]), 8)
    occ = OT.binarize_density_grid(dg)
    assert bool(occ.grid.all())          # warmup: everything occupied
    dg0 = OT.DensityGrid(jnp.zeros((8, 8, 8)), dg.aabb_min, dg.aabb_max)
    occ0 = OT.binarize_density_grid(dg0)
    assert not bool(occ0.grid.any())


def test_update_density_grid_decays_and_probes():
    cfg = NeRFConfig(D=2, W=32, multires=4, multires_views=2, skips=(0,))
    params = create_train_state(jax.random.PRNGKey(0), cfg, cfg).params
    dg = OT.init_density_grid(np.array([-2.0, -2, -2]),
                              np.array([2.0, 2, 2]), 8)
    rcfg = _rcfg()
    new = OT.update_density_grid(dg, params["fine"], cfg, rcfg,
                                 jax.random.PRNGKey(1), decay=0.5)
    ema = np.asarray(new.ema)
    assert np.isfinite(ema).all()
    # the FIRST update replaces the uninitialized sentinel with the probe
    # outright (1e4 would otherwise take ~270 decays to clear threshold)
    assert (ema < np.asarray(dg.ema)).all()
    # subsequent updates are max(decay * old, probe): never below decay*old
    prev = ema
    new = OT.update_density_grid(new, params["fine"], cfg, rcfg,
                                 jax.random.PRNGKey(2), decay=0.5)
    assert (np.asarray(new.ema) >= 0.5 * prev - 1e-6).all()
    # a random-init model is near-empty: the grid must sparsify after the
    # first real probe
    occ = OT.binarize_density_grid(new)
    assert float(jnp.mean(occ.grid.astype(jnp.float32))) < 1.0


def test_occ_step_trains():
    """Loss decreases through the full occ step (sampling + triage +
    selection + fine render + Adam)."""
    cfg = NeRFConfig(D=2, W=32, multires=4, multires_views=2, skips=(0,))
    rcfg = _rcfg()
    H = W = 16
    K = np.array([[20.0, 0, W / 2], [0, 20.0, H / 2], [0, 0, 1]])
    spec = PixelSamplerSpec.from_K(H, W, K, N_rand=64, single_image=True,
                                   precrop_iters=0)
    state = create_train_state(jax.random.PRNGKey(0), cfg, cfg, lrate=5e-3)
    # constant-color target: fittable from 3D structure (random pixels are
    # not — their variance is an irreducible loss floor)
    images = jnp.full((2, H, W, 3), 0.3, jnp.float32)
    poses = jnp.asarray(np.stack([np.eye(3, 4)] * 2).astype(np.float32))
    occ = OT.binarize_density_grid(
        OT.init_density_grid(np.array([-4.0, -4, -4]),
                             np.array([4.0, 4, 4]), 8))
    step = OT.make_occ_train_step(
        rcfg, cfg, spec, n_candidates=12, n_keep=6, inner_steps=5,
        donate=False,
    )
    first = None
    coarse0 = jax.device_get(state.params["coarse"])
    for i in range(8):
        state, aux = step(state, occ, images, poses,
                          jax.random.fold_in(jax.random.PRNGKey(1), i))
        if first is None:
            first = float(aux["loss"])
    assert float(aux["loss"]) < first * 0.8, (first, float(aux["loss"]))
    assert int(state.step) == 40
    # the coarse network must ride along untouched
    coarse1 = jax.device_get(state.params["coarse"])
    for a, b in zip(jax.tree_util.tree_leaves(coarse0),
                    jax.tree_util.tree_leaves(coarse1)):
        np.testing.assert_array_equal(a, b)


def test_occ_step_rejects_keep_above_candidates():
    """--train_occ_keep > --train_occ_candidates must fail loudly at build
    time, not with a broadcast shape error mid-step (round-2 advisor)."""
    import pytest

    cfg = NeRFConfig(D=2, W=32, multires=4, multires_views=2, skips=(0,))
    K = np.array([[20.0, 0, 8.0], [0, 20.0, 8.0], [0, 0, 1]])
    spec = PixelSamplerSpec.from_K(16, 16, K, N_rand=16, single_image=True,
                                   precrop_iters=0)
    with pytest.raises(ValueError, match="train_occ_keep"):
        OT.make_occ_train_step(_rcfg(), cfg, spec, n_candidates=8, n_keep=16)


@pytest.mark.slow  # >15 s on the 1-core box (convergence/e2e-style)
def test_occ_step_sharded():
    """The occ step under shard_map on the 8-device mesh: finite loss,
    advancing step counter."""
    from nerf_shared_tpu.parallel.mesh import make_mesh, replicate

    mesh = make_mesh()
    cfg = NeRFConfig(D=2, W=32, multires=4, multires_views=2, skips=(0,))
    rcfg = _rcfg()
    H = W = 16
    K = np.array([[20.0, 0, W / 2], [0, 20.0, H / 2], [0, 0, 1]])
    spec = PixelSamplerSpec.from_K(H, W, K, N_rand=8 * 8, single_image=True,
                                   precrop_iters=0)
    state = create_train_state(jax.random.PRNGKey(0), cfg, cfg)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.random((2, H, W, 3)).astype(np.float32))
    poses = jnp.asarray(np.stack([np.eye(3, 4)] * 2).astype(np.float32))
    occ = OT.binarize_density_grid(
        OT.init_density_grid(np.array([-4.0, -4, -4]),
                             np.array([4.0, 4, 4]), 4))
    step = OT.make_occ_train_step(rcfg, cfg, spec, n_candidates=8, n_keep=4,
                                  mesh=mesh, inner_steps=2, donate=False)
    state = replicate(mesh, state)
    occ = replicate(mesh, occ)
    images = replicate(mesh, images)
    poses = replicate(mesh, poses)
    state, aux = step(state, occ, images, poses, jax.random.PRNGKey(2))
    assert np.isfinite(float(aux["loss"]))
    assert int(state.step) == 2


@pytest.mark.slow  # >15 s on the 1-core box (convergence/e2e-style)
def test_warmup_noise_breaks_init_gradient_trap():
    """At the torch-parity init, sigma is negative over the whole scene
    volume (relu gradient exactly zero), so the noiseless fine-only loss
    sits in a near-flat region; sigma noise (raw_noise_std, the reference's
    own regularizer) must produce a usefully larger gradient — the warmup
    escape mechanism of --train_occ (see --train_occ_warmup_noise)."""
    import dataclasses

    cfg = NeRFConfig(D=8, W=256, use_viewdirs=True, multires=10,
                     multires_views=4, skips=(4,))
    state = create_train_state(jax.random.PRNGKey(0), cfg, cfg)
    rcfg = _rcfg(N_samples=16, perturb=1.0)
    rng = np.random.default_rng(0)
    n = 32
    rd = rng.standard_normal((n, 3)).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
    rb = jnp.asarray(np.concatenate(
        [np.zeros((n, 3), np.float32), rd,
         np.full((n, 1), 2, np.float32), np.full((n, 1), 6, np.float32),
         rd], -1))
    target = jnp.full((n, 3), 0.3)
    occ = OccupancyGrid(jnp.ones((4, 4, 4), bool),
                        jnp.array([-8.0, -8, -8]), jnp.array([8.0, 8, 8]))

    def gnorm(r):
        def loss(p):
            return OT.occ_nerf_loss(p, occ, rb, target,
                                    jax.random.PRNGKey(5), r, cfg, 16, 8)[0]
        g = jax.grad(loss)(state.params)
        return sum(float(jnp.linalg.norm(x))
                   for x in jax.tree_util.tree_leaves(g))

    quiet = gnorm(rcfg)
    noisy = gnorm(dataclasses.replace(rcfg, raw_noise_std=1.0))
    assert noisy > 10 * quiet, (quiet, noisy)


def test_weighted_selection_concentrates_on_high_density():
    """Candidate budgeting (exponential-race weighted random-K): a
    candidate with overwhelming weight is always kept; near-uniform
    weights reproduce uniform selection properties (depth order, counts,
    padding)."""
    rng = np.random.default_rng(1)
    R, C, K = 48, 24, 4
    z = np.sort(rng.uniform(2, 6, (R, C)), axis=-1).astype(np.float32)
    occ = np.ones((R, C), bool)
    far = jnp.full((R, 1), 6.0)
    w = np.full((R, C), 1e-4, np.float32)
    w[:, 10] = 1e5                       # one dominant candidate per ray
    z_sel, valid = OT._random_k_of_occupied(
        jax.random.PRNGKey(0), jnp.asarray(z), jnp.asarray(occ), K, far,
        weights=jnp.asarray(w),
    )
    z_sel, valid = np.asarray(z_sel), np.asarray(valid)
    assert valid.all()
    # the dominant depth must be among the K selected on (almost) every ray
    hit = np.abs(z_sel - z[:, 10:11]) < 1e-6
    assert hit.any(-1).mean() > 0.95

    # near-uniform weights: same structural properties as uniform selection
    occ2 = rng.random((R, C)) < 0.4
    wu = jnp.ones((R, C), jnp.float32)
    z2, v2 = OT._random_k_of_occupied(
        jax.random.PRNGKey(1), jnp.asarray(z), jnp.asarray(occ2), K, far,
        weights=wu,
    )
    z2, v2 = np.asarray(z2), np.asarray(v2)
    for r in range(R):
        assert v2[r].sum() == min(K, occ2[r].sum())
        sel = z2[r][v2[r]]
        assert (np.diff(sel) > 0).all()
        assert np.isin(np.round(sel, 5), np.round(z[r][occ2[r]], 5)).all()


@pytest.mark.slow  # >15 s on the 1-core box (convergence/e2e-style)
def test_budgeted_loss_and_step_run():
    """occ_nerf_loss + the production step accept a DensityGrid for
    budgeting: finite loss/grads, selection still valid."""
    cfg = NeRFConfig(D=2, W=32, multires=4, multires_views=2, skips=(0,))
    rcfg = _rcfg()
    H = W = 16
    K = np.array([[20.0, 0, W / 2], [0, 20.0, H / 2], [0, 0, 1]])
    spec = PixelSamplerSpec.from_K(H, W, K, N_rand=32, single_image=True,
                                   precrop_iters=0)
    state = create_train_state(jax.random.PRNGKey(0), cfg, cfg)
    images = jnp.full((2, H, W, 3), 0.3, jnp.float32)
    poses = jnp.asarray(np.stack([np.eye(3, 4)] * 2).astype(np.float32))
    dg = OT.init_density_grid(np.array([-4.0, -4, -4]),
                              np.array([4.0, 4, 4]), 8)
    # a probed grid (not the UNINIT sentinel) so the weights are real
    dg = OT.update_density_grid(dg, state.params["fine"], cfg, rcfg,
                                jax.random.PRNGKey(3))
    occ = OT.binarize_density_grid(dg, force_occupied=True)
    step = OT.make_occ_train_step(rcfg, cfg, spec, n_candidates=12,
                                  n_keep=6, inner_steps=2, donate=False)
    st, aux = step(state, occ, images, poses, jax.random.PRNGKey(1),
                   density=dg)
    assert np.isfinite(float(aux["loss"]))
    assert int(st.step) == 2
    # and without density (the default path still works)
    st2, aux2 = step(state, occ, images, poses, jax.random.PRNGKey(1))
    assert np.isfinite(float(aux2["loss"]))


def test_probe_subsampling_updates_subset_and_converges():
    """max_probes: only probed cells replace their sentinel; repeated
    subsampled refreshes converge to the whole-grid refresh's occupancy."""
    cfg = NeRFConfig(D=2, W=32, multires=4, multires_views=2, skips=(0,))
    rcfg = _rcfg(perturb=0.0)
    state = create_train_state(jax.random.PRNGKey(0), cfg, cfg)
    lo, hi = np.array([-2.0, -2, -2]), np.array([2.0, 2, 2])
    g = 8
    full = OT.update_density_grid(OT.init_density_grid(lo, hi, g),
                                  state.params["fine"], cfg, rcfg,
                                  jax.random.PRNGKey(0))
    # one subsampled pass: some cells must still carry the UNINIT sentinel
    part = OT.update_density_grid(OT.init_density_grid(lo, hi, g),
                                  state.params["fine"], cfg, rcfg,
                                  jax.random.PRNGKey(0), max_probes=64)
    n_uninit = int(np.sum(np.asarray(part.ema) >= OT._UNINIT))
    assert 0 < n_uninit < g ** 3
    # many passes: sentinel count goes to ~zero and values approximate the
    # full probe (same field, different jitter draws)
    dg = OT.init_density_grid(lo, hi, g)
    for i in range(100):
        dg = OT.update_density_grid(dg, state.params["fine"], cfg, rcfg,
                                    jax.random.fold_in(
                                        jax.random.PRNGKey(1), i),
                                    max_probes=64)
    # probes draw WITH replacement: a couple of coupon-collector stragglers
    # may remain — they stay conservatively occupied, by design
    probed = np.asarray(dg.ema) < OT._UNINIT
    assert probed.mean() > 0.99
    occ_full = np.asarray(OT.binarize_density_grid(full).grid)
    occ_part = np.asarray(OT.binarize_density_grid(dg).grid)
    agree = (occ_full == occ_part)[probed].mean()
    assert agree > 0.9, agree
