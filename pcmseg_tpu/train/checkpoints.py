"""Orbax checkpointing: one canonical format, latest + best (+ per-fold),
with *real* resume.

The reference had three ad-hoc torch.save formats and a resume feature that
was documented but never implemented (SURVEY.md §5 checkpoint row, §8.9).
Here every checkpoint is an Orbax directory containing:

  * ``state``    — the TrainState pytree (params, opt_state incl. injected
                   LR, batch_stats, step) via StandardCheckpointer.
  * ``meta.json``— epoch, monitored loss, fold, config snapshot, and the
                   host-side scheduler/early-stopping states — everything
                   needed to continue training exactly where it stopped.

Naming mirrors the reference artifacts: ``latest`` (utils/trainer.py:255),
``best`` (utils/trainer.py:271), ``best_fold_{k}`` (train_bph_cv.py:397).
"""

from __future__ import annotations

import itertools
import json
import os
import shutil
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import orbax.checkpoint as ocp

# monotonic per-process save counter; processes call save in lockstep, so
# the sequence — and thus the payload directory name — matches across hosts
_SAVE_SEQ = itertools.count()


def _as_abspath(path: str) -> str:
    return os.path.abspath(os.path.expanduser(path))


def save_checkpoint(
    directory: str,
    name: str,
    state,
    meta: Optional[Dict[str, Any]] = None,
) -> str:
    """Save a TrainState + metadata under {directory}/{name}. Overwrites.

    Crash-safe: the payload is written into a hidden sibling directory
    (``.{name}.{seq}``) and ``{name}`` is an atomically-replaced symlink,
    so an interrupted save never leaves the tree without the previous
    valid checkpoint (a naive rmtree-then-write destroyed 'latest' on a
    mid-save crash, defeating resume).

    Multi-host: every process calls this (Orbax coordinates the array
    write itself); the metadata write, symlink swap, and GC run on the
    primary only, with a global sync before returning.
    """
    multiproc = jax.process_count() > 1
    primary = jax.process_index() == 0

    directory = _as_abspath(directory)
    if primary:
        os.makedirs(directory, exist_ok=True)
    path = os.path.join(directory, name)

    # deterministic payload name: identical across processes (they save in
    # lockstep), never the payload the live symlink currently points at
    current = os.readlink(path) if os.path.islink(path) else None
    while True:
        payload_name = f".{name}.{next(_SAVE_SEQ)}"
        if payload_name != current:
            break
    payload = os.path.join(directory, payload_name)
    if primary and os.path.exists(payload):  # orphan from an older run
        shutil.rmtree(payload)

    with ocp.StandardCheckpointer() as ckptr:
        # apply_fn/tx are callables, not state — strip to the data pytree
        tree = {
            "params": state.params,
            "opt_state": state.opt_state,
            "batch_stats": state.batch_stats,
            "step": state.step,
        }
        # EMA params ride along only when enabled (ema_decay>0) so that
        # non-EMA checkpoints keep the pre-EMA on-disk structure
        if getattr(state, "ema_params", None):
            tree["ema_params"] = state.ema_params
        ckptr.save(os.path.join(payload, "state"), tree)

    if primary:
        with open(os.path.join(payload, "meta.json"), "w") as f:
            json.dump(_jsonable(meta or {}), f, indent=2)
        _swap_in(directory, name, payload_name)
    if multiproc:
        _process_barrier(f"pcmseg_ckpt_{payload_name}")
    return path


def _process_barrier(tag: str, timeout_ms: int = 600_000) -> None:
    """Cross-process barrier over the distributed COORDINATION SERVICE
    (gRPC), not a device collective.

    Why not ``multihost_utils.sync_global_devices``: that is an XLA psum —
    a device computation. Async checkpointing runs saves in a worker
    thread while the MAIN thread keeps dispatching training collectives;
    two threads independently enqueueing device collectives can interleave
    in different orders on different processes and deadlock the job. The
    coordination-service barrier touches no device, so it is safe from any
    thread. ``tag`` must be unique per call across the job and identical
    across processes — callers pass the payload name, which carries the
    lockstep save-sequence number.
    """
    from jax._src import distributed

    client = getattr(distributed.global_state, "client", None)
    if client is None:  # not a distributed run
        return
    client.wait_at_barrier(tag, timeout_in_ms=timeout_ms)


def _swap_in(directory: str, name: str, payload_name: str) -> None:
    """Atomically point {directory}/{name} at the new payload dir, then GC
    the previous payload and any orphans of interrupted earlier saves."""
    path = os.path.join(directory, name)
    old_target = None
    if os.path.islink(path):
        old_target = os.path.join(directory, os.readlink(path))
    elif os.path.isdir(path):
        # legacy plain-directory checkpoint: move aside before linking
        old_target = path + ".legacy"
        if os.path.exists(old_target):
            shutil.rmtree(old_target)
        os.rename(path, old_target)
    payload = os.path.join(directory, payload_name)
    tmp_link = payload + ".lnk"
    if os.path.lexists(tmp_link):
        os.remove(tmp_link)
    os.symlink(payload_name, tmp_link)
    os.replace(tmp_link, path)  # atomic on POSIX

    if old_target and os.path.exists(old_target):
        shutil.rmtree(old_target)
    # GC payload dirs orphaned by interrupted earlier saves
    live = os.readlink(path)
    prefix = f".{name}."
    for entry in os.listdir(directory):
        if (
            entry.startswith(prefix)
            and entry != live
            and not entry.endswith(".lnk")
            and entry[len(prefix):].isdigit()
        ):
            shutil.rmtree(os.path.join(directory, entry), ignore_errors=True)


def copy_checkpoint(directory: str, src_name: str, dst_name: str) -> str:
    """Duplicate an existing checkpoint under a new name WITHOUT touching
    the device: host-side payload copy + the same atomic symlink swap.

    Why this exists: 'best' at epoch e is byte-identical to 'latest' at
    epoch e, but a second full save re-fetches the whole TrainState from
    the device — and on a tunneled/remote chip that D2H (~1.1 GB for the
    90M-param flagship state) dominates save cost and stalls the training
    stream sharing the link (measured: see BENCH.md round-3 "Checkpoint
    cost"). A disk-to-disk copy costs no device time at all.

    Crash-safe like save_checkpoint: the copy lands in a hidden payload
    dir and {dst_name} is an atomically-replaced symlink. Multi-host: all
    processes advance the payload counter (keeping save sequences in
    lockstep); filesystem work runs on the primary; global sync before
    returning.
    """
    multiproc = jax.process_count() > 1
    primary = jax.process_index() == 0
    directory = _as_abspath(directory)
    src = os.path.join(directory, src_name)
    dst = os.path.join(directory, dst_name)

    current = os.readlink(dst) if os.path.islink(dst) else None
    while True:
        payload_name = f".{dst_name}.{next(_SAVE_SEQ)}"
        if payload_name != current:
            break
    if primary:
        src_payload = (
            os.path.join(directory, os.readlink(src))
            if os.path.islink(src)
            else src
        )
        payload = os.path.join(directory, payload_name)
        if os.path.exists(payload):  # orphan from an older run
            shutil.rmtree(payload)
        shutil.copytree(src_payload, payload)
        _swap_in(directory, dst_name, payload_name)
    if multiproc:
        _process_barrier(f"pcmseg_ckpt_copy_{payload_name}")
    return dst


def _jsonable(obj):
    if isinstance(obj, dict):
        return {k: _jsonable(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_jsonable(v) for v in obj]
    if isinstance(obj, (np.floating, np.integer)):
        return obj.item()
    if isinstance(obj, jax.Array):
        return np.asarray(obj).tolist()
    return obj


def load_checkpoint(path: str, state_template) -> Tuple[Any, Dict[str, Any]]:
    """Restore (state, meta) from a checkpoint directory.

    ``state_template`` is a freshly built TrainState with the same model/
    optimizer config; its pytree structure types the restore, and its
    apply_fn/tx are carried over.
    """
    path = _as_abspath(path)
    if not os.path.exists(os.path.join(path, "state")) and os.path.isdir(
        os.path.join(path + ".legacy", "state")
    ):
        # a crash between the legacy-dir rename and the symlink creation in
        # save_checkpoint leaves the previous checkpoint at {name}.legacy
        path = path + ".legacy"
    state_path = os.path.join(path, "state")
    template = {
        "params": state_template.params,
        "opt_state": state_template.opt_state,
        "batch_stats": state_template.batch_stats,
        "step": state_template.step,
    }
    want_ema = bool(getattr(state_template, "ema_params", None))
    if want_ema:
        template["ema_params"] = state_template.ema_params
    with ocp.StandardCheckpointer() as ckptr:
        try:
            tree = ckptr.restore(state_path, template)
        except Exception:
            # structure mismatch on the optional ema_params subtree: a
            # resume/load whose config flipped ema_decay relative to the
            # checkpoint. Retry with the opposite template and reconcile
            # below (checkpoint-without-ema + ema template: EMA restarts
            # from the restored params; checkpoint-with-ema + plain
            # template: the EMA subtree is dropped).
            if want_ema:
                template.pop("ema_params")
            else:
                template["ema_params"] = jax.tree.map(
                    np.asarray, jax.device_get(state_template.params)
                )
            tree = ckptr.restore(state_path, template)

    ema = tree.get("ema_params", {}) if want_ema else {}
    if want_ema and not ema:
        # fresh buffers, not aliases: params leaves may be donated later
        ema = jax.tree.map(jnp.copy, tree["params"])
    state = state_template.replace(
        params=tree["params"],
        opt_state=tree["opt_state"],
        batch_stats=tree["batch_stats"],
        step=tree["step"],
        ema_params=ema,
    )
    meta_file = os.path.join(path, "meta.json")
    meta = {}
    if os.path.exists(meta_file):
        with open(meta_file) as f:
            meta = json.load(f)
    return state, meta


def checkpoint_exists(directory: str, name: str) -> bool:
    base = os.path.join(_as_abspath(directory), name)
    return os.path.isdir(os.path.join(base, "state")) or os.path.isdir(
        os.path.join(base + ".legacy", "state")
    )


def latest_path(directory: str) -> str:
    return os.path.join(_as_abspath(directory), "latest")


# ---- torch interop ---------------------------------------------------------


def params_from_torch_state_dict(state_dict, params) -> Any:
    """Map a reference-layout PyTorch UNet3D state_dict onto our params.

    Used for numerics-parity validation against PyTorch checkpoints
    (the reference's .pth files: bare state dicts or
    {'model_state_dict': ...}, script/validate_model.py:174-180).

    Layout mapping:
      torch Conv3d weight  (O, I, kD, kH, kW) → flax (kD, kH, kW, I, O)
      torch ConvTranspose3d weight (I, O, kD, kH, kW)
          → flax ConvTranspose kernel (kD, kH, kW, I, O)  [flipped spatially]
      torch BN weight/bias/running_mean/running_var → scale/bias/mean/var

    Module-name mapping (reference models/unet3d.py:197-222 → ours):
      inc.conv.{0,3}        → inc/conv{0,1};      inc.conv.{1,4} → inc/norm{0,1}
      downN.maxpool_conv.1  → downN/double_conv;  upN.up → upN/up
      upN.conv              → upN/double_conv;    outc → outc
    """
    import torch

    if "model_state_dict" in state_dict:
        state_dict = state_dict["model_state_dict"]

    def t2n(t):
        return np.asarray(t.detach().cpu().numpy())

    flat = dict(state_dict.items())

    # fail with a readable message, not a flax scope error deep in apply:
    # the first conv pins base_features (torch layout O,I,kD,kH,kW vs our
    # kernel (kD,kH,kW,I,O))
    got = tuple(flat["inc.conv.0.weight"].shape)
    want_k = np.asarray(params["inc"]["conv0"]["kernel"]).shape
    want = (want_k[4], want_k[3], want_k[0], want_k[1], want_k[2])
    if got != want:
        raise ValueError(
            f"torch checkpoint architecture mismatch: inc conv weight is "
            f"{got}, expected {want} — the checkpoint was trained with "
            f"base_features={got[0]}/n_modalities={got[1]}; pass matching "
            f"--base_features (and config) when loading it"
        )
    new_params = jax.tree_util.tree_map(lambda x: x, params)  # copy structure

    def conv_kernel(w):
        # (O, I, kD, kH, kW) → (kD, kH, kW, I, O)
        return np.transpose(t2n(w), (2, 3, 4, 1, 0))

    def convT_kernel(w):
        # torch (I, O, kD, kH, kW); torch convT applies the kernel
        # spatially flipped relative to flax's ConvTranspose gather
        a = np.transpose(t2n(w), (2, 3, 4, 0, 1))  # (kD,kH,kW,I,O)
        return a[::-1, ::-1, ::-1]

    def dc_map(torch_prefix, ours):
        """torch Sequential DoubleConv → our conv0/norm0/conv1/norm1."""
        for ti, (cname, nname) in ((0, ("conv0", "norm0")), (3, ("conv1", "norm1"))):
            ours[cname]["kernel"] = conv_kernel(flat[f"{torch_prefix}.{ti}.weight"])
            ours[cname]["bias"] = t2n(flat[f"{torch_prefix}.{ti}.bias"])
            ours[nname]["scale"] = t2n(flat[f"{torch_prefix}.{ti + 1}.weight"])
            ours[nname]["bias"] = t2n(flat[f"{torch_prefix}.{ti + 1}.bias"])

    p = jax.tree_util.tree_map(np.asarray, new_params)
    p = jax.device_get(p)
    p = _to_mutable(p)

    dc_map("inc.conv", p["inc"])
    for i in range(1, 5):
        dc_map(f"down{i}.maxpool_conv.1.conv", p[f"down{i}"]["double_conv"])
    for i in range(1, 5):
        up = p[f"up{i}"]
        up["up"]["kernel"] = convT_kernel(flat[f"up{i}.up.weight"])
        up["up"]["bias"] = t2n(flat[f"up{i}.up.bias"])
        dc_map(f"up{i}.conv.conv", up["double_conv"])
    p["outc"]["kernel"] = conv_kernel(flat["outc.weight"])
    p["outc"]["bias"] = t2n(flat["outc.bias"])
    return p


def batch_stats_from_torch_state_dict(state_dict, batch_stats) -> Any:
    """Running mean/var from a torch state_dict onto our batch_stats tree."""
    import torch  # noqa: F401

    if "model_state_dict" in state_dict:
        state_dict = state_dict["model_state_dict"]

    def t2n(t):
        return np.asarray(t.detach().cpu().numpy())

    flat = dict(state_dict.items())
    bs = _to_mutable(jax.device_get(batch_stats))

    def bn_map(torch_prefix, ours):
        for ti, nname in ((1, "norm0"), (4, "norm1")):
            ours[nname]["mean"] = t2n(flat[f"{torch_prefix}.{ti}.running_mean"])
            ours[nname]["var"] = t2n(flat[f"{torch_prefix}.{ti}.running_var"])

    bn_map("inc.conv", bs["inc"])
    for i in range(1, 5):
        bn_map(f"down{i}.maxpool_conv.1.conv", bs[f"down{i}"]["double_conv"])
        bn_map(f"up{i}.conv.conv", bs[f"up{i}"]["double_conv"])
    return bs


def params_to_torch_state_dict(params, batch_stats=None) -> dict:
    """Export our params (+BN stats) as a reference-layout torch state_dict.

    Inverse of :func:`params_from_torch_state_dict`, so reference-pipeline
    tooling (script/validate_model.py:174-180-style loaders) can consume
    checkpoints trained here. Returns {name: torch.Tensor}.
    """
    import torch

    p = _to_mutable(jax.device_get(params))
    bs = _to_mutable(jax.device_get(batch_stats)) if batch_stats else {}
    sd = {}

    def t(arr):
        # .copy(): jax.device_get can hand back non-writable views, which
        # torch.from_numpy warns about
        return torch.from_numpy(np.ascontiguousarray(np.asarray(arr)).copy())

    def conv_out(kernel):
        # flax (kD,kH,kW,I,O) → torch (O,I,kD,kH,kW)
        return t(np.transpose(np.asarray(kernel), (4, 3, 0, 1, 2)))

    def convT_out(kernel):
        # undo the import-side spatial flip, then (kD,kH,kW,I,O)→(I,O,...)
        a = np.asarray(kernel)[::-1, ::-1, ::-1]
        return t(np.transpose(a, (3, 4, 0, 1, 2)))

    def dc_out(prefix, ours, stats):
        for ti, (cname, nname) in ((0, ("conv0", "norm0")), (3, ("conv1", "norm1"))):
            sd[f"{prefix}.{ti}.weight"] = conv_out(ours[cname]["kernel"])
            sd[f"{prefix}.{ti}.bias"] = t(ours[cname]["bias"])
            if nname in ours:  # absent on BN-folded params
                sd[f"{prefix}.{ti + 1}.weight"] = t(ours[nname]["scale"])
                sd[f"{prefix}.{ti + 1}.bias"] = t(ours[nname]["bias"])
                if stats and nname in stats:
                    sd[f"{prefix}.{ti + 1}.running_mean"] = t(stats[nname]["mean"])
                    sd[f"{prefix}.{ti + 1}.running_var"] = t(stats[nname]["var"])
                    sd[f"{prefix}.{ti + 1}.num_batches_tracked"] = torch.zeros(
                        (), dtype=torch.int64
                    )

    dc_out("inc.conv", p["inc"], bs.get("inc"))
    for i in range(1, 5):
        dc_out(
            f"down{i}.maxpool_conv.1.conv",
            p[f"down{i}"]["double_conv"],
            (bs.get(f"down{i}") or {}).get("double_conv"),
        )
    for i in range(1, 5):
        sd[f"up{i}.up.weight"] = convT_out(p[f"up{i}"]["up"]["kernel"])
        sd[f"up{i}.up.bias"] = t(p[f"up{i}"]["up"]["bias"])
        dc_out(
            f"up{i}.conv.conv",
            p[f"up{i}"]["double_conv"],
            (bs.get(f"up{i}") or {}).get("double_conv"),
        )
    sd["outc.weight"] = conv_out(p["outc"]["kernel"])
    sd["outc.bias"] = t(p["outc"]["bias"])
    return sd


def export_torch_checkpoint(path: str, state, meta: Optional[dict] = None) -> str:
    """Write a reference-compatible .pth ({'model_state_dict': ...} + meta)."""
    import torch

    payload = {
        "model_state_dict": params_to_torch_state_dict(
            state.params, state.batch_stats
        ),
    }
    if meta:
        payload.update(_jsonable(meta))
    torch.save(payload, path)
    return path


def _to_mutable(tree):
    if isinstance(tree, dict):
        return {k: _to_mutable(v) for k, v in tree.items()}
    return tree
