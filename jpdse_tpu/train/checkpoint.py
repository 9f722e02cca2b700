"""Checkpointing with the reference's semantics (SURVEY.md §5):
best-val-gated saves unless always_save (train.py:129), full train-state
persistence (both optimizers, counters — pix2pixHD_trainer.py:119-176), and
graceful *partial* restore across architecture/phase changes
(base_model.py:62-97: load whatever matches by path+shape, keep fresh init
for the rest; optimizer state falls back to fresh on mismatch, mirroring the
KeyError fallbacks at pix2pixHD_trainer.py:151-168).

Storage: Orbax for the tensor PyTrees (``params`` and ``opt`` subtrees saved
separately so params can partially restore while optimizer state degrades
gracefully) + a JSON sidecar for host-side state (epoch, LR scheduler).
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import orbax.checkpoint as ocp

from jpdse_tpu.train.state import GANTrainState

PARAMS_DIR = "params"
OPT_DIR = "opt"
META_FILE = "trainer_meta.json"


def save_checkpoint(
    save_dir: str,
    state: GANTrainState,
    epoch: int,
    extra_meta: Optional[Dict] = None,
):
    import gc

    os.makedirs(save_dir, exist_ok=True)
    ckptr = ocp.StandardCheckpointer()

    def to_host(tree):
        # Hand orbax HOST numpy trees, not device arrays: on the TPU relay,
        # saving device arrays leaked ~one full host copy of the state per
        # save (measured: a 390-epoch run grew to 70GB RSS over 28 saves and
        # was OOM-killed). One explicit fetch here, freed after the write.
        #
        # JPDSE_CKPT_FETCH_THREADS=N (default 1 = serial) fetches leaves
        # through a thread pool: the relay's D2H path serializes ~15-30MB/s
        # per stream, so a flagship save (~3GB of params + Adam moments)
        # dominates the training loop's wall clock between val improvements;
        # concurrent streams can aggregate if the relay multiplexes.
        # Opt-in pending an on-chip A/B (the serial path is the measured,
        # known-good default).
        nthreads = int(os.environ.get("JPDSE_CKPT_FETCH_THREADS", "1"))
        if nthreads > 1:
            from concurrent.futures import ThreadPoolExecutor

            leaves, treedef = jax.tree.flatten(tree)
            idx = [i for i, x in enumerate(leaves) if isinstance(x, jax.Array)]
            if idx:
                with ThreadPoolExecutor(nthreads) as ex:
                    fetched = list(
                        ex.map(lambda i: np.asarray(leaves[i]), idx)
                    )
                for i, v in zip(idx, fetched):
                    leaves[i] = v
            return jax.tree.unflatten(treedef, leaves)
        return jax.tree.map(
            lambda x: np.asarray(x) if isinstance(x, jax.Array) else x, tree
        )

    params = {"params_g": state.params_g, "params_d": state.params_d}
    if state.mstate_g:
        params["mstate_g"] = state.mstate_g
    if state.mstate_d:
        params["mstate_d"] = state.mstate_d
    opt = {
        "opt_state_g": state.opt_state_g,
        "opt_state_d": state.opt_state_d,
        "steps_taken": state.steps_taken,
        "lambda_distortion_weight": state.lambda_distortion_weight,
        "best_val_loss": state.best_val_loss,
    }
    params = to_host(params)
    opt = to_host(opt)
    ckptr.save(os.path.abspath(os.path.join(save_dir, PARAMS_DIR)), params, force=True)
    ckptr.save(os.path.abspath(os.path.join(save_dir, OPT_DIR)), opt, force=True)
    ckptr.wait_until_finished()
    del params, opt
    gc.collect()
    if jax.process_index() == 0:  # host-side sidecar: primary writes
        meta = {"epoch": epoch}
        meta.update(extra_meta or {})
        with open(os.path.join(save_dir, META_FILE), "w") as f:
            json.dump(meta, f)


def merge_trees(template, loaded, counter) -> object:
    """Partial merge: loaded leaves replace template leaves when the path
    exists and shapes agree; everything else keeps the template (fresh init).
    The JAX-native form of the reference's partial state_dict load
    (base_model.py:70-97)."""

    def rec(t, l):
        if isinstance(t, dict):
            if not isinstance(l, dict):
                return t
            return {k: (rec(v, l[k]) if k in l else v) for k, v in t.items()}
        if isinstance(t, (list, tuple)):
            if not isinstance(l, (list, tuple)) or len(t) != len(l):
                return t
            return type(t)(rec(a, b) for a, b in zip(t, l))
        if l is None:
            return t
        try:
            arr = np.asarray(l)
            tpl = np.asarray(t)
        except Exception:
            return t
        if arr.shape != tpl.shape:
            return t
        counter[0] += 1
        return jnp.asarray(arr, dtype=tpl.dtype)

    return rec(template, loaded)


def restore_checkpoint(
    checkpoints_dir: str,
    template_state: GANTrainState,
    restore_opt: bool = True,
) -> Tuple[GANTrainState, Dict]:
    """Restore into a freshly-initialized template state. Params merge
    partially; optimizer/counter state restores exactly or falls back fresh.
    Returns (state, host meta dict)."""
    params_path = os.path.abspath(os.path.join(checkpoints_dir, PARAMS_DIR))
    raw_params = ocp.PyTreeCheckpointer().restore(params_path)
    counter = [0]
    template_params = {
        "params_g": template_state.params_g,
        "params_d": template_state.params_d,
    }
    if template_state.mstate_g:
        template_params["mstate_g"] = template_state.mstate_g
    if template_state.mstate_d:
        template_params["mstate_d"] = template_state.mstate_d
    merged = merge_trees(template_params, raw_params, counter)
    state = template_state.replace(
        params_g=merged["params_g"],
        params_d=merged["params_d"],
        mstate_g=merged.get("mstate_g", template_state.mstate_g),
        mstate_d=merged.get("mstate_d", template_state.mstate_d),
    )
    n_total = len(jax.tree.leaves(template_params))
    print(
        f"restored params from {checkpoints_dir}: {counter[0]}/{n_total} leaves matched"
    )

    if restore_opt:
        opt_path = os.path.abspath(os.path.join(checkpoints_dir, OPT_DIR))
        target = {
            "opt_state_g": template_state.opt_state_g,
            "opt_state_d": template_state.opt_state_d,
            "steps_taken": template_state.steps_taken,
            "lambda_distortion_weight": template_state.lambda_distortion_weight,
            "best_val_loss": template_state.best_val_loss,
        }
        try:
            opt = ocp.StandardCheckpointer().restore(opt_path, target)
            state = state.replace(**opt)
        except Exception as e:  # phase change: fresh optimizer state
            print(f"optimizer state not restored ({type(e).__name__}); keeping fresh init")

    meta = {}
    meta_path = os.path.join(checkpoints_dir, META_FILE)
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    return state, meta
