"""Window-boundary checkpoint / resume.

The reference has NO checkpointing — all state (swfd sketch, prev_clusters,
clusterer, results) lives in memory per run (SURVEY.md §5.4).  Here the
stream is resumable: everything the engine carries across windows is a
fixed-shape pytree (by design), so a checkpoint is one npz file:

  * device state: the StreamState pytree, flattened with key-paths
  * host state: stream cursor, prev_clusters, accumulated labels, RNG seed,
    incremental-clusterer buffers, metric accumulators

Atomic write (tmp + rename) so a crash mid-checkpoint leaves the previous
checkpoint intact — sketch state is tiny (ell x d), recovery is cheap.

TRUST MODEL: checkpoints are pickle-bearing (treedef + host dict blobs), so
``load_checkpoint`` executes code embedded in the file — load only
checkpoints this process (or an equally trusted one) wrote.  In particular,
``process_streaming_data(checkpoint_dir=...)`` auto-resumes from the newest
file in that directory: point it only at directories with the same write
trust as the training job itself (the standard assumption for framework
checkpoints, same as torch.load / orbax with custom nodes).
"""
from __future__ import annotations

import io
import json
import os
import pickle

import numpy as np
import jax


def _flatten_pytree(tree):
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    return [np.asarray(l) for l in leaves], treedef


def save_checkpoint(path: str, device_state, host_state: dict) -> str:
    """Serialize (device pytree, picklable host dict) atomically to ``path``."""
    leaves, treedef = _flatten_pytree(device_state)
    payload = {f"leaf_{i}": leaf for i, leaf in enumerate(leaves)}
    payload["treedef"] = np.frombuffer(pickle.dumps(treedef), dtype=np.uint8)
    payload["host"] = np.frombuffer(pickle.dumps(host_state), dtype=np.uint8)
    buf = io.BytesIO()
    np.savez_compressed(buf, **payload)
    tmp = path + ".tmp"
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(tmp, "wb") as f:
        f.write(buf.getvalue())
    os.replace(tmp, path)
    return path


def load_checkpoint(path: str):
    """Returns (device_state pytree, host_state dict)."""
    with np.load(path, allow_pickle=False) as z:
        treedef = pickle.loads(z["treedef"].tobytes())
        host_state = pickle.loads(z["host"].tobytes())
        n_leaves = sum(1 for k in z.files if k.startswith("leaf_"))
        leaves = [jax.numpy.asarray(z[f"leaf_{i}"]) for i in range(n_leaves)]
    try:
        device_state = jax.tree_util.tree_unflatten(treedef, leaves)
    except (TypeError, ValueError) as exc:
        # the pickled treedef references state classes BY NAME; a checkpoint
        # written before a state-schema change (e.g. SWFDState gaining
        # block_loss) reconstructs against the new class and fails here
        raise ValueError(
            f"checkpoint {path} has an incompatible state schema (written by "
            f"an older version of mused_tpu?) — delete the checkpoint "
            f"directory to restart the stream from scratch: {exc}") from exc
    return device_state, host_state


def latest_checkpoint(ckpt_dir: str, prefix: str = "stream") -> str | None:
    if not os.path.isdir(ckpt_dir):
        return None
    def widx(f):
        # only <prefix>_<int>.npz names participate: a foreign file like
        # stream_manual.npz (serving save() accepts any path) crashed the
        # auto-resume sort with ValueError (review r5)
        tail = f.rsplit("_", 1)[-1][:-4]
        return int(tail) if tail.isdigit() else None

    cands = [f for f in os.listdir(ckpt_dir)
             if f.startswith(prefix) and f.endswith(".npz")
             and widx(f) is not None]
    if not cands:
        return None
    cands.sort(key=widx)
    return os.path.join(ckpt_dir, cands[-1])


def checkpoint_name(ckpt_dir: str, window_index: int,
                    prefix: str = "stream") -> str:
    return os.path.join(ckpt_dir, f"{prefix}_{window_index:08d}.npz")
