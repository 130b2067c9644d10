"""Checkpoint save/load.

Two interoperable formats:

1. **Native**: a single ``{iter:06d}.ckpt.npz`` per save holding the flat
   param/optimizer pytree + the global step. Pure numpy; no torch needed.
2. **Reference-compatible ``.tar``** (requires torch): the exact dict schema
   of the reference (utils.py:444-456) — keys ``global_step``,
   ``coarse_model_state_dict``, ``fine_model_state_dict``,
   ``optimizer_state_dict`` — with torch tensor layouts ([out, in] Linear
   weights) and torch Adam state (exp_avg/exp_avg_sq/step), so checkpoints
   round-trip between this framework and the PyTorch reference. Coarse-only
   runs store an empty fine dict instead of crashing (the reference bug at
   utils.py:453, SURVEY.md §2.3).

Resume semantics mirror reference utils.py:174-214: scan the experiment dir,
newest file wins, ``ft_path`` overrides, ``no_reload`` disables.
"""

from __future__ import annotations

import os
import re
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# pytree <-> flat dict
# ---------------------------------------------------------------------------


def _flatten(tree, prefix="") -> Dict[str, np.ndarray]:
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}{i}/"))
    elif type(tree).__name__ == "MaskedNode":
        # optax.multi_transform placeholder for out-of-group leaves (the
        # per-group moments of the grid/net optimizer split) — not data
        pass
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def _unflatten(flat: Dict[str, np.ndarray]):
    root: Dict[str, Any] = {}
    for key, val in flat.items():
        parts = key.split("/")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val

    def listify(node):
        if not isinstance(node, dict):
            return node
        keys = list(node.keys())
        if keys and all(re.fullmatch(r"\d+", k) for k in keys):
            return [listify(node[str(i)]) for i in range(len(keys))]
        return {k: listify(v) for k, v in node.items()}

    return listify(root)


# ---------------------------------------------------------------------------
# native format
# ---------------------------------------------------------------------------


def save_native(path: str, params: Dict, opt_state_flat: Dict,
                global_step: int, ema: Dict = None):
    flat = {f"params/{k}": v for k, v in _flatten(params).items()}
    flat.update({f"opt/{k}": v for k, v in opt_state_flat.items()})
    if ema is not None:
        # EMA shadow of coarse/fine (--ema_decay, train/step.py): a
        # sidecar namespace so the params/ schema stays byte-stable
        flat.update({f"ema/{k}": v for k, v in _flatten(ema).items()})
    flat["global_step"] = np.asarray(global_step, np.int64)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez(path, **flat)


def load_native(path: str) -> Tuple[Dict, Dict, int]:
    with np.load(path) as z:
        flat = {k: z[k] for k in z.files}
    step = int(flat.pop("global_step"))
    params = _unflatten(
        {k[len("params/"):]: v for k, v in flat.items() if k.startswith("params/")}
    )
    opt = {k[len("opt/"):]: v for k, v in flat.items() if k.startswith("opt/")}
    return params, opt, step


def load_native_ema(path: str):
    """The EMA sidecar of a native checkpoint, or None (pre-EMA file or
    .tar)."""
    if not path.endswith(".npz"):
        return None
    with np.load(path) as z:
        flat = {k[len("ema/"):]: z[k] for k in z.files
                if k.startswith("ema/")}
    return _unflatten(flat) if flat else None


def _adam_parts(opt_state):
    import optax

    return [
        p for p in jax.tree_util.tree_leaves(
            opt_state,
            is_leaf=lambda x: isinstance(x, optax.ScaleByAdamState),
        )
        if isinstance(p, optax.ScaleByAdamState)
    ]


def adam_state_to_flat(opt_state) -> Dict[str, np.ndarray]:
    """Serialize the optax adam chain state (count + mu/nu pytrees).

    One adam part (the reference's single Adam, utils.py:163-172) keeps the
    original flat schema. Multiple parts (optax.multi_transform for the
    grid/net learning-rate split of the triplane family) serialize as
    g{i}/-prefixed groups in traversal order — the same order
    flat_to_adam_state rebuilds them in."""
    parts = _adam_parts(opt_state)
    if not parts:
        raise ValueError("no ScaleByAdamState found in optimizer state")
    if len(parts) == 1:
        part = parts[0]
        flat = {"count": np.asarray(part.count)}
        flat.update({f"mu/{k}": v for k, v in _flatten(part.mu).items()})
        flat.update({f"nu/{k}": v for k, v in _flatten(part.nu).items()})
        return flat
    flat = {"n_groups": np.asarray(len(parts))}
    for gi, part in enumerate(parts):
        flat[f"g{gi}/count"] = np.asarray(part.count)
        flat.update({f"g{gi}/mu/{k}": v
                     for k, v in _flatten(part.mu).items()})
        flat.update({f"g{gi}/nu/{k}": v
                     for k, v in _flatten(part.nu).items()})
    return flat


def _has_real_leaves(tree) -> bool:
    """True if the subtree holds any actual array position (i.e. anything
    besides optax.MaskedNode placeholders)."""
    if isinstance(tree, dict):
        return any(_has_real_leaves(v) for v in tree.values())
    if isinstance(tree, (list, tuple)):
        return any(_has_real_leaves(v) for v in tree)
    return type(tree).__name__ != "MaskedNode"


def _merge_into(init, saved, path=""):
    """Overlay a partially-saved tree (real leaves only) onto the freshly
    initialized structure. Masked positions (optax.MaskedNode — the
    out-of-group leaves of a multi_transform part) legitimately have no
    saved counterpart and keep their placeholders; a REAL leaf missing from
    the save is a structure mismatch (changed architecture / truncated
    file) and must fail loudly — silently keeping zero Adam moments at a
    late-schedule count would spike the effective LR with no diagnostic."""
    if isinstance(init, dict):
        if not isinstance(saved, dict):
            raise ValueError(
                f"checkpoint optimizer-state mismatch at '{path}': "
                f"expected a dict, saved has {type(saved).__name__}")
        out = {}
        for k, v in init.items():
            if k in saved:
                out[k] = _merge_into(v, saved[k], f"{path}{k}/")
            elif _has_real_leaves(v):
                raise ValueError(
                    f"checkpoint optimizer-state mismatch: '{path}{k}' "
                    "exists in the model but not in the checkpoint "
                    "(architecture changed since save?)")
            else:
                out[k] = v  # masked subtree — nothing was saved, correctly
        return out
    if isinstance(init, (list, tuple)):
        if not isinstance(saved, (list, tuple)) or len(saved) != len(init):
            raise ValueError(
                f"checkpoint optimizer-state mismatch at '{path}': "
                f"sequence length {len(init)} vs saved "
                f"{len(saved) if isinstance(saved, (list, tuple)) else type(saved).__name__}")
        merged = [_merge_into(a, b, f"{path}{i}/")
                  for i, (a, b) in enumerate(zip(init, saved))]
        return type(init)(merged) if isinstance(init, tuple) else merged
    if type(init).__name__ == "MaskedNode":
        return init
    return jnp.asarray(saved)


def flat_to_adam_state(tx, params, flat: Dict[str, np.ndarray]):
    """Rebuild the optimizer state for ``tx`` from serialized mu/nu/count
    (single-adam schema or the g{i}/ multi-group schema)."""
    import optax

    state = tx.init(params)
    multi = "n_groups" in flat

    def group(gi):
        pre = f"g{gi}/" if multi else ""
        mu = _unflatten({k[len(pre) + 3:]: v for k, v in flat.items()
                         if k.startswith(pre + "mu/")})
        nu = _unflatten({k[len(pre) + 3:]: v for k, v in flat.items()
                         if k.startswith(pre + "nu/")})
        return mu, nu, jnp.asarray(flat[pre + "count"], jnp.int32)

    n_groups = int(flat["n_groups"]) if multi else 1
    groups = [group(gi) for gi in range(n_groups)]
    max_count = jnp.asarray(max(int(g[2]) for g in groups), jnp.int32)

    counter = {"i": 0}

    def replace_part(part):
        if isinstance(part, optax.ScaleByAdamState):
            mu, nu, count = groups[counter["i"]]
            counter["i"] += 1
            # jnp.array(copy=True): every leaf must own its buffer, or jit
            # donation of the state rejects the doubly-donated buffer
            return optax.ScaleByAdamState(
                count=jnp.array(count, copy=True),
                mu=_merge_into(part.mu, mu),
                nu=_merge_into(part.nu, nu),
            )
        if isinstance(part, optax.ScaleByScheduleState):
            # the LR schedule's step counter must resume too, or the decayed
            # learning rate would reset to its initial value
            return optax.ScaleByScheduleState(
                count=jnp.array(max_count, copy=True))
        return part

    is_stateful = lambda x: isinstance(  # noqa: E731
        x, (optax.ScaleByAdamState, optax.ScaleByScheduleState)
    )
    return jax.tree_util.tree_map(replace_part, state, is_leaf=is_stateful)


# ---------------------------------------------------------------------------
# torch .tar shim
# ---------------------------------------------------------------------------

# torch module attribute order of the reference NeRF (nerf.py:79-94); the
# parameter iteration order both state_dict and Adam param indices follow.
def _torch_param_order(params: Dict) -> list:
    order = []
    for i in range(len(params["pts_linears"])):
        order += [f"pts_linears.{i}.weight", f"pts_linears.{i}.bias"]
    if "views_linears" in params:
        for i in range(len(params["views_linears"])):
            order += [f"views_linears.{i}.weight", f"views_linears.{i}.bias"]
        order += [
            "feature_linear.weight", "feature_linear.bias",
            "alpha_linear.weight", "alpha_linear.bias",
            "rgb_linear.weight", "rgb_linear.bias",
        ]
    else:
        order += ["output_linear.weight", "output_linear.bias"]
    return order


def params_to_state_dict(params: Dict) -> Dict[str, "object"]:
    """JAX pytree ([in,out] weights) -> torch state_dict ([out,in])."""
    import torch

    flat = _flatten(params)
    sd = {}
    for name in _torch_param_order(params):
        mod, idx_or_field, *rest = name.split(".")
        if rest:  # ModuleList entry: mod.idx.field
            key = f"{mod}/{idx_or_field}/{'w' if rest[0] == 'weight' else 'b'}"
        else:
            key = f"{mod}/{'w' if idx_or_field == 'weight' else 'b'}"
        arr = np.asarray(flat[key])
        if name.endswith("weight"):
            arr = arr.T  # [in,out] -> [out,in]
        # explicit copy: device_get arrays are non-writable and
        # ascontiguousarray returns them as-is — torch.from_numpy then
        # warns (and writing through the tensor would be UB)
        sd[name] = torch.from_numpy(np.array(arr, copy=True, order="C"))
    return sd


def state_dict_to_params(sd: Dict, template: Dict) -> Dict:
    """torch state_dict -> JAX pytree shaped like ``template``."""
    flat = {}
    for name, tensor in sd.items():
        arr = np.asarray(tensor.detach().cpu().numpy(), np.float32)
        parts = name.split(".")
        if len(parts) == 3:  # modlist.idx.field
            key = f"{parts[0]}/{parts[1]}/{'w' if parts[2] == 'weight' else 'b'}"
        else:
            key = f"{parts[0]}/{'w' if parts[1] == 'weight' else 'b'}"
        if name.endswith("weight"):
            arr = arr.T
        flat[key] = arr
    tree = _unflatten(flat)
    # sanity: identical treedef as template
    t1 = jax.tree_util.tree_structure(template)
    t2 = jax.tree_util.tree_structure(tree)
    if t1 != t2:
        raise ValueError(f"checkpoint structure mismatch: {t2} vs {t1}")
    return jax.tree_util.tree_map(
        lambda a, b: jnp.asarray(a, dtype=jnp.asarray(b).dtype), tree, template
    )


def save_tar(
    path: str,
    params: Dict,
    opt_flat: Optional[Dict],
    global_step: int,
):
    """Write the reference `.tar` schema (utils.py:444-456). Coarse-only runs
    get an empty fine dict (reference would crash, SURVEY.md §2.3)."""
    import torch

    coarse_sd = params_to_state_dict(params["coarse"])
    fine_sd = (
        params_to_state_dict(params["fine"]) if "fine" in params else {}
    )

    opt_sd: Dict[str, Any] = {"state": {}, "param_groups": []}
    if opt_flat is not None and "n_groups" in opt_flat:
        # multi-group schema (the pose-twist LR split, train/state.py): the
        # torch .tar carries only the net group's Adam — pick the group
        # whose mu tree holds the coarse network
        for gi in range(int(opt_flat["n_groups"])):
            pre = f"g{gi}/"
            if any(k.startswith(pre + "mu/coarse/") for k in opt_flat):
                opt_flat = {k[len(pre):]: v for k, v in opt_flat.items()
                            if k.startswith(pre)}
                break
        else:
            opt_flat = None
    if opt_flat is not None:
        order = _torch_param_order(params["coarse"])
        trees = [("coarse", params["coarse"])]
        if "fine" in params:
            trees.append(("fine", params["fine"]))
        idx = 0
        step_t = torch.tensor(float(opt_flat["count"]))
        pg_params = []
        for prefix, tree in trees:
            for name in _torch_param_order(tree):
                key = _name_to_flat(name)
                mu = np.asarray(opt_flat[f"mu/{prefix}/{key}"])
                nu = np.asarray(opt_flat[f"nu/{prefix}/{key}"])
                if name.endswith("weight"):
                    mu, nu = mu.T, nu.T
                opt_sd["state"][idx] = {
                    "step": step_t,
                    "exp_avg": torch.from_numpy(
                        np.array(mu, copy=True, order="C")),
                    "exp_avg_sq": torch.from_numpy(
                        np.array(nu, copy=True, order="C")),
                }
                pg_params.append(idx)
                idx += 1
        opt_sd["param_groups"] = [
            {
                "lr": 5e-4, "betas": (0.9, 0.999), "eps": 1e-8,
                "weight_decay": 0, "amsgrad": False, "maximize": False,
                "foreach": None, "capturable": False, "differentiable": False,
                "fused": None, "params": pg_params,
            }
        ]

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    torch.save(
        {
            "global_step": int(global_step),
            "coarse_model_state_dict": coarse_sd,
            "fine_model_state_dict": fine_sd,
            "optimizer_state_dict": opt_sd,
        },
        path,
    )


def _name_to_flat(name: str) -> str:
    parts = name.split(".")
    if len(parts) == 3:
        return f"{parts[0]}/{parts[1]}/{'w' if parts[2] == 'weight' else 'b'}"
    return f"{parts[0]}/{'w' if parts[1] == 'weight' else 'b'}"


def load_tar(path: str, params_template: Dict) -> Tuple[Dict, Optional[Dict], int]:
    """Read a reference-schema `.tar`; returns (params, opt_flat | None, step)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    step = int(ckpt["global_step"])
    params = {
        "coarse": state_dict_to_params(
            ckpt["coarse_model_state_dict"], params_template["coarse"]
        )
    }
    if "fine" in params_template and ckpt.get("fine_model_state_dict"):
        params["fine"] = state_dict_to_params(
            ckpt["fine_model_state_dict"], params_template["fine"]
        )
    elif "fine" in params_template:
        params["fine"] = params_template["fine"]

    opt_flat = None
    opt_sd = ckpt.get("optimizer_state_dict") or {}
    if opt_sd.get("state"):
        opt_flat = {}
        trees = [("coarse", params["coarse"])]
        if "fine" in params:
            trees.append(("fine", params["fine"]))
        idx = 0
        count = 0
        for prefix, tree in trees:
            for name in _torch_param_order(tree):
                st = opt_sd["state"].get(idx)
                key = _name_to_flat(name)
                if st is None:
                    mu = np.zeros_like(np.asarray(_flatten(tree)[key]))
                    nu = np.zeros_like(mu)
                else:
                    mu = np.asarray(st["exp_avg"].detach().cpu().numpy())
                    nu = np.asarray(st["exp_avg_sq"].detach().cpu().numpy())
                    count = int(st["step"])
                    if name.endswith("weight"):
                        mu, nu = mu.T, nu.T
                opt_flat[f"mu/{prefix}/{key}"] = mu.astype(np.float32)
                opt_flat[f"nu/{prefix}/{key}"] = nu.astype(np.float32)
                idx += 1
        opt_flat["count"] = np.asarray(count, np.int32)
    return params, opt_flat, step


# ---------------------------------------------------------------------------
# high-level save / resume
# ---------------------------------------------------------------------------


def save_checkpoints(
    basedir: str,
    expname: str,
    state,
    i: int,
    fmt: str = "both",
):
    """Save iteration ``i``'s checkpoint under {basedir}/{expname}
    (filename contract of reference utils.py:449)."""
    expdir = os.path.join(basedir, expname)
    os.makedirs(expdir, exist_ok=True)
    params = jax.device_get(state.params)
    opt_flat = adam_state_to_flat(jax.device_get(state.opt_state))
    step = int(jax.device_get(state.step))
    ema = None
    if isinstance(getattr(state, "aux_state", None), dict) \
            and "ema" in state.aux_state:
        ema = jax.device_get(state.aux_state["ema"])
    if fmt not in ("native", "tar", "both"):
        raise ValueError(
            f"unknown checkpoint format {fmt!r} (native | tar | both) — "
            "refusing to silently save nothing")
    paths = []
    # the reference .tar schema is defined for the MLP family only
    # (state_dict names pts_linears/..., reference nerf.py:79-94); grid
    # families have no torch counterpart to round-trip with. BOTH branches
    # must be MLPs: a mixed proposal hierarchy (MLP coarse + grid fine,
    # factory.nerf_configs) has no .tar layout for its fine net either.
    tar_able = all(
        "pts_linears" in params[b]
        for b in ("coarse", "fine") if b in params
    ) and "coarse" in params
    if fmt == "tar" and not tar_able:
        raise ValueError(
            "torch .tar export is only defined for the 'nerf' model family "
            "(the reference checkpoint schema has no grid-parameter "
            "layout); use --ckpt_format native for this model")
    if fmt in ("native", "both") or not tar_able:
        p = os.path.join(expdir, f"{i:06d}.ckpt.npz")
        save_native(p, params, opt_flat, step, ema=ema)
        paths.append(p)
    if fmt in ("tar", "both") and tar_able:
        p = os.path.join(expdir, f"{i:06d}.tar")
        save_tar(p, params, opt_flat, step)
        paths.append(p)
    return paths


def find_checkpoints(basedir: str, expname: str, ft_path: Optional[str] = None):
    """Candidate checkpoints sorted oldest->newest (reference utils.py:185-189)."""
    if ft_path is not None and ft_path != "None":
        return [ft_path]
    expdir = os.path.join(basedir, expname)
    if not os.path.isdir(expdir):
        return []
    return [
        os.path.join(expdir, f)
        for f in sorted(os.listdir(expdir))
        if ("tar" in f or f.endswith(".ckpt.npz"))
    ]


def load_checkpoint(
    state,
    args,
    checkpoint_index: Optional[int] = None,
    trainable: bool = True,
):
    """Restore the newest checkpoint into ``state``; returns (state, start).
    Mirrors reference utils.py:174-214 (newest-wins, ft_path override,
    no_reload kill-switch).

    ``trainable=False`` is the reference's ``b_load_ckpnt_as_trainable``
    (utils.py:206-212, requires_grad=False): the returned state's optimizer
    is replaced by a zero-update transform, so any train step leaves the
    loaded params bit-identical. In JAX this knob is rarely needed — the
    pose app freezes by construction (params never enter the optimizer) —
    but it closes the one reference API surface without a counterpart."""
    ckpts = find_checkpoints(args.basedir, args.expname, args.ft_path)
    if not ckpts or args.no_reload:
        return state, 0
    path = ckpts[checkpoint_index if checkpoint_index is not None else -1]
    # auxiliary per-image parameter groups ride the NATIVE schema only;
    # the torch .tar layout is the reference's field-only contract
    aux_groups = {"pose_twists": "--refine_poses pose twists",
                  "appearance": "--appearance exposure corrections"}
    wanted = [k for k in aux_groups if k in state.params]
    if wanted and path.endswith(".tar"):
        # a same-step native sibling (default --ckpt_format both) carries
        # the full state including the aux groups
        sibling = path[: -len(".tar")] + ".ckpt.npz"
        if sibling in ckpts:
            path = sibling
    print(f"Reloading from {path}")
    if path.endswith(".npz"):
        params, opt_flat, step = load_native(path)
        for k, label in aux_groups.items():
            if k in params and k not in state.params:
                print(f"checkpoint carries {label} but the flag is off: "
                      "dropping them (Adam moments reset)")
                params.pop(k)
                opt_flat = None
            elif k in state.params and k not in params:
                print(f"{label} requested but absent from the checkpoint: "
                      "starting them at identity (Adam moments reset)")
                params[k] = jax.device_get(state.params)[k]
                opt_flat = None
        params = jax.tree_util.tree_map(
            lambda a, b: jnp.asarray(a, jnp.asarray(b).dtype),
            params,
            jax.device_get(state.params),
        )
    else:
        params, opt_flat, step = load_tar(path, jax.device_get(state.params))
        for k in wanted:
            print(f"torch .tar has no {aux_groups[k]} group: starting at "
                  "identity (Adam moments reset — the .tar's single-adam "
                  "schema cannot map onto the group split)")
            params[k] = jax.device_get(state.params)[k]
            opt_flat = None
    new_state = state.replace(
        step=jnp.asarray(step, jnp.int32),
        params=jax.tree_util.tree_map(jnp.asarray, params),
    )
    if isinstance(getattr(state, "aux_state", None), dict) \
            and "ema" in state.aux_state:
        # the caller trains with --ema_decay: restore the EMA sidecar, or
        # (pre-EMA checkpoint / .tar) restart the shadow at the loaded
        # params
        ema = load_native_ema(path)
        if ema is None:
            ema = {k: jax.tree_util.tree_map(jnp.copy, new_state.params[k])
                   for k in state.aux_state["ema"]}
        else:
            ema = jax.tree_util.tree_map(jnp.asarray, ema)
        new_state = new_state.replace(
            aux_state={**state.aux_state, "ema": ema})
    if opt_flat is not None:
        new_state = new_state.replace(
            opt_state=flat_to_adam_state(state.tx, new_state.params, opt_flat)
        )
    if not trainable:
        import optax

        frozen_tx = optax.set_to_zero()
        new_state = new_state.replace(
            tx=frozen_tx, opt_state=frozen_tx.init(new_state.params)
        )
    return new_state, step
