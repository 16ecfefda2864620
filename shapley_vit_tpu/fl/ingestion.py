"""Client checkpoint ingestion: the FL "network" is a shared filesystem.

Reference behavior (start.py:134-222): the server blocks polling for
``shapleyserver/local_training/client_{i}_model/ViT_epoch_9.pth.tar`` per
client with a 1s sleep loop and a broken O_EXCL lock probe (O_EXCL without
O_CREAT is a POSIX no-op — SURVEY.md §5), then ``th.load`` +
``load_state_dict``.

Redesign (same contract, sound mechanics):
  * writers use ATOMIC RENAME — write ``<file>.tmp`` then ``os.replace`` — so
    a file that exists is complete; no lock probe needed;
  * the watcher takes a ``timeout`` and a straggler ``policy``: ``"wait"``
    (block forever, the reference's behavior), ``"skip"`` (proceed with the
    subset that arrived — the selection vector marks absentees), ``"fail"``;
  * checkpoints load as either torch ``.pth.tar`` (reference clients,
    ``ckpt['state_dict']`` with peft naming, start.py:146-151) or our native
    ``.npz`` (peft-style keys), both converted to LoRA pytrees via
    ``models.convert``. ``.pth.tar`` parses through the torch-free
    RESTRICTED reader (``fl/torch_ckpt.py``) — the server never unpickles
    arbitrary objects from an untrusted client upload and never imports
    torch in the serve path.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import jax
import numpy as np

from shapley_vit_tpu.fl import torch_ckpt
from shapley_vit_tpu.models import convert
from shapley_vit_tpu.models.vit import ViTSpec

PyTree = Any


# ---------------------------------------------------------------------------
# writing (the client side / test fixture side)
# ---------------------------------------------------------------------------

def atomic_save_npz(path: str, arrays: Dict[str, np.ndarray]) -> None:
    """Write-then-rename so readers never observe a partial file."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **arrays)
    os.replace(tmp, path)


# Metadata keys ride inside the checkpoint so the ingestion contract can
# carry per-client FedAvg weights (reference ``num_local_data_train``,
# client2.py:7-42, load-bearing for SV via the data-size ratios of
# server2.py:68-81). npz: prefixed flat keys; pth.tar: top-level dict keys
# beside 'state_dict'.
_META_PREFIX = "__meta__."
_META_KEYS = ("num_local_data_train",)


def save_lora_checkpoint(
    path: str,
    lora_tree: PyTree,
    spec: ViTSpec,
    num_local_data_train: Optional[int] = None,
) -> None:
    """Save our LoRA overlay in peft naming (interoperable with reference
    tooling); .npz native, .pth.tar via torch if requested.
    ``num_local_data_train`` (the client's local training-set size) is stored
    as checkpoint metadata and recovered by :func:`ingest_clients`."""
    import jax

    # one batched D2H fetch: the converter's per-leaf np.asarray would issue
    # ~50 separate device transfers (measured 1.5 s/export through the
    # tunnel vs ~0.1 s batched)
    lora_tree = jax.device_get(lora_tree)
    sd = convert.tree_to_peft_lora(lora_tree, spec)
    meta: Dict[str, Any] = {}
    if num_local_data_train is not None:
        meta["num_local_data_train"] = int(num_local_data_train)
    if path.endswith(".npz"):
        arrays = dict(sd)
        for k, v in meta.items():
            arrays[_META_PREFIX + k] = np.asarray(v)
        atomic_save_npz(path, arrays)
    else:
        # native torch-zip writer (fl/torch_ckpt.py): loadable by the
        # reference's torch.load without importing torch here
        ckpt: Dict[str, Any] = {"state_dict": dict(sd)}
        ckpt.update(meta)
        torch_ckpt.write_checkpoint(path, ckpt)


# ---------------------------------------------------------------------------
# loading
# ---------------------------------------------------------------------------

def _load_raw(
    path: str, data: Optional[bytes] = None
) -> Tuple[Dict[str, np.ndarray], Dict[str, Any]]:
    """One file read -> (numpy state dict, metadata dict). ``data`` holds
    the file's bytes when already read (the native preloader's bulk path);
    the format is still dispatched on the path suffix."""
    if data is not None:
        import io

        src = io.BytesIO(data)
    else:
        src = path
    if path.endswith(".npz"):
        with np.load(src) as z:
            sd, meta = {}, {}
            for k in z.files:
                if k.startswith(_META_PREFIX):
                    meta[k[len(_META_PREFIX):]] = z[k].item()
                else:
                    sd[k] = z[k]
            return sd, meta
    # torch .pth.tar: the NATIVE restricted reader (fl/torch_ckpt.py) —
    # a server must not run the full pickle machinery on an untrusted
    # client upload (torch.load(weights_only=False) is code execution),
    # and the serve path must stay torch-free (BENCH_NOTES round-4 soak).
    # UnsafeCheckpointError propagates: an off-allow-list pickle is
    # hostile, never retried through torch.
    try:
        ckpt = torch_ckpt.read_checkpoint(data if data is not None else path)
    except torch_ckpt.NativeFormatError as e:
        # Legacy pre-1.6 torch serialization is NOT parsed by default: the
        # fallback imports torch into the serve process (the round-4 leak
        # rule) and hands torch's unpickler attacker-chosen bytes — a
        # client could OPT INTO the weaker path just by writing a non-zip
        # file. Operators with genuinely old trusted fleets set
        # SVT_TORCH_LEGACY_CKPT=1 (loads with weights_only=True).
        if os.environ.get("SVT_TORCH_LEGACY_CKPT", "") != "1":
            raise torch_ckpt.NativeFormatError(
                f"{path}: not a torch-zip checkpoint ({e}); legacy pre-1.6 "
                "torch files are refused on the ingest path unless "
                "SVT_TORCH_LEGACY_CKPT=1 is set"
            ) from None
        import torch

        ckpt = torch.load(src, map_location="cpu", weights_only=True)
    meta: Dict[str, Any] = {}
    if isinstance(ckpt, dict):
        meta = {k: ckpt[k] for k in _META_KEYS if k in ckpt}
        for key in ("state_dict", "model_state_dict"):
            if key in ckpt:
                ckpt = ckpt[key]
                break
    return convert.torch_state_dict_to_numpy(ckpt), meta


def load_checkpoint_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a client checkpoint into a numpy state dict. Torch ``.pth.tar``
    files carry ``{'state_dict': ...}`` (reference cent_sgd.py:142-147 uses
    'model_state_dict'; both keys accepted)."""
    return _load_raw(path)[0]


def load_checkpoint_metadata(path: str) -> Dict[str, Any]:
    """Metadata dict (e.g. ``num_local_data_train``) from a checkpoint."""
    return _load_raw(path)[1]


def load_client_lora(path: str, spec: ViTSpec) -> PyTree:
    """Checkpoint -> LoRA overlay tree (lora A/B + classifier)."""
    return convert.peft_lora_to_tree(load_checkpoint_state_dict(path), spec)


def client_delta(client_lora: PyTree, init_lora: PyTree) -> PyTree:
    """Weight delta vs. the initial global overlay (reference
    ``get_difference_between_network_weights``, utils.py:735-749 — only the
    trainable overlay differs under LoRA fine-tuning, so the delta lives
    entirely in the overlay tree).

    Computed on the HOST (numpy): checkpoints load as numpy trees, and a
    leafwise ``jnp.subtract`` here would cost one device dispatch plus one
    piecemeal H2D upload per leaf per client (~n_clients × n_leaves small
    tunnel round-trips — measured as the dominant ingest cost at n=32,
    BENCH_NOTES round 4). Host subtraction keeps deltas as numpy; the
    caller uploads the whole stacked ``[n, ...]`` tree in ONE batched
    ``device_put``. IEEE float32 subtraction is bit-identical either way.
    Pass a host ``init_lora`` (``jax.device_get`` once per round) — a
    device-array leaf is pulled back per call otherwise."""
    return jax.tree.map(
        lambda a, b: np.subtract(np.asarray(a), np.asarray(b)),
        client_lora,
        init_lora,
    )


# ---------------------------------------------------------------------------
# watching
# ---------------------------------------------------------------------------

@dataclass
class WatchResult:
    paths: List[Optional[str]]          # per-client checkpoint path or None
    arrived: List[bool]                 # the client selection vector
    waited_seconds: float


def default_checkpoint_paths(
    root: str, num_clients: int, filename: str = "ViT_epoch_9.pth.tar"
) -> List[str]:
    """The reference's layout: ``<root>/client_{i}_model/<filename>`` with
    1-based client directories (start.py:134-136)."""
    return [
        os.path.join(root, f"client_{i + 1}_model", filename)
        for i in range(num_clients)
    ]


def checkpoint_path_candidates(
    root: str, num_clients: int, filename: str = "ViT_epoch_9.pth.tar"
) -> List[List[str]]:
    """Per-client CANDIDATE checkpoint paths: the configured filename plus
    its sibling in the other supported format (``.pth.tar`` ↔ ``.npz``).

    A mixed fleet converges without configuration: reference clients write
    torch ``.pth.tar`` while ``svt-client`` writes native ``.npz`` — the
    server accepts whichever appears (first candidate wins when both do).
    Feed the result to :func:`wait_for_checkpoints`, which resolves each
    client to the concrete path that arrived."""
    alts = [filename]
    if filename.endswith(".pth.tar"):
        alts.append(filename[: -len(".pth.tar")] + ".npz")
    elif filename.endswith(".npz"):
        alts.append(filename[: -len(".npz")] + ".pth.tar")
    return [
        [os.path.join(root, f"client_{i + 1}_model", a) for a in alts]
        for i in range(num_clients)
    ]


def resolve_data_sizes(
    sizes: Sequence[Optional[int]],
    selection: Sequence[bool],
    log_fn: Optional[Callable[[str], None]] = None,
) -> List[float]:
    """Turn per-client metadata sizes into FedAvg weights.

    Sizes are used only when EVERY arrived client carries
    ``num_local_data_train`` — mixing absolute sizes with a 1.0 placeholder
    for legacy checkpoints would weight the legacy client at ~1/N_data and
    silently erase it from aggregation and SV. On partial metadata the whole
    round falls back to equal weights (the pre-metadata behavior), with a
    log line so operators notice.
    """
    arrived = [s for s, sel in zip(sizes, selection) if sel]
    if arrived and all(s is not None and s > 0 for s in arrived):
        return [float(s) if s else 1.0 for s in sizes]
    if any(s for s in arrived) and log_fn is not None:
        log_fn(
            "partial num_local_data_train metadata across clients: "
            "falling back to equal FedAvg weights for this round"
        )
    return [1.0] * len(sizes)


def wait_for_checkpoints(
    paths: Sequence[str],
    timeout: Optional[float] = None,
    poll_interval: float = 1.0,
    policy: str = "wait",
    log_fn: Optional[Callable[[str], None]] = None,
    _sleep=time.sleep,
    use_native: bool = True,
    should_stop: Optional[Callable[[], bool]] = None,
) -> WatchResult:
    """Wait until every path exists (atomic-rename protocol: existence ==
    completeness). ``policy`` on timeout: 'wait' ignores the timeout
    (reference start.py:212-219 blocks forever), 'skip' returns with the
    subset that arrived, 'fail' raises TimeoutError.

    ``should_stop`` (when given) is polled about once per ``poll_interval``;
    when it turns true the wait returns EARLY with whatever arrived — never
    raising, even under ``policy='fail'`` (the caller asked to stop; it
    distinguishes a drain from a straggler itself). This is how a service
    draining on SIGTERM escapes an otherwise-indefinite idle wait.

    Each entry of ``paths`` may be ONE path or a sequence of CANDIDATE
    paths for that client (:func:`checkpoint_path_candidates` — mixed
    ``.pth.tar``/``.npz`` fleets); the returned ``WatchResult.paths`` hold
    the concrete path that arrived (first listed candidate wins).

    Backend: the native inotify watcher (csrc/svt_runtime.cpp) when built —
    event-driven, no 1s sleep loop; grouped candidates use the group-aware
    wait (``svt_wait_for_file_groups``: any candidate satisfies its client) —
    else pure-Python polling."""
    if policy not in ("wait", "skip", "fail"):
        raise ValueError(f"unknown straggler policy {policy!r}")
    start = time.time()
    groups = [[p] if isinstance(p, str) else list(p) for p in paths]

    if use_native:
        try:
            from shapley_vit_tpu.fl import native

            if native.native_available():
                eff_timeout = None if policy == "wait" else timeout
                stopped = False
                if should_stop is None:
                    # one event-driven block for the whole wait
                    found, count = native.wait_for_file_groups(
                        groups, timeout=eff_timeout
                    )
                else:
                    # slice the block so should_stop is polled ~once per
                    # poll_interval; arrivals still return immediately
                    # (inotify), only the STOP latency is the slice width
                    deadline = (
                        None if eff_timeout is None else start + eff_timeout
                    )
                    # `stopped` LATCHES the observation: a should_stop that
                    # later flips back (a DRAIN file deleted between polls)
                    # must not fall through to the policy='fail' raise —
                    # once seen, the wait ends as a stop, period
                    while True:
                        if should_stop():
                            found = [
                                next((p for p in g if os.path.exists(p)), None)
                                for g in groups
                            ]
                            return WatchResult(
                                found,
                                [f is not None for f in found],
                                time.time() - start,
                            )
                        sl = poll_interval
                        if deadline is not None:
                            sl = min(sl, max(0.0, deadline - time.time()))
                        found, count = native.wait_for_file_groups(
                            groups, timeout=sl
                        )
                        if count == len(groups):
                            break
                        if should_stop():
                            stopped = True
                            break
                        if deadline is not None and time.time() >= deadline:
                            break
                elapsed = time.time() - start
                arrived = [f is not None for f in found]
                if count == len(groups):
                    return WatchResult(found, arrived, elapsed)
                if should_stop is not None and stopped:
                    return WatchResult(found, arrived, elapsed)
                if policy == "fail":
                    missing = [g[0] for g, a in zip(groups, arrived) if not a]
                    raise TimeoutError(f"clients never delivered: {missing}")
                return WatchResult(found, arrived, elapsed)
        except (OSError, RuntimeError, AttributeError):
            pass  # fall through to polling (stale .so without the group API)
    while True:
        found = [next((p for p in g if os.path.exists(p)), None) for g in groups]
        arrived = [f is not None for f in found]
        if all(arrived):
            return WatchResult(found, arrived, time.time() - start)
        if should_stop is not None and should_stop():
            return WatchResult(found, arrived, time.time() - start)
        elapsed = time.time() - start
        if timeout is not None and elapsed >= timeout and policy != "wait":
            if policy == "fail":
                missing = [g[0] for g, a in zip(groups, arrived) if not a]
                raise TimeoutError(f"clients never delivered: {missing}")
            return WatchResult(found, arrived, elapsed)
        if log_fn is not None:
            missing = sum(1 for a in arrived if not a)
            log_fn(f"waiting for {missing} client checkpoint(s)...")
        _sleep(poll_interval)


def ingest_clients(
    paths: Sequence[Optional[str]],
    init_lora: PyTree,
    spec: ViTSpec,
    on_error: str = "raise",
    log_fn: Optional[Callable[[str], None]] = None,
) -> Tuple[List[Optional[PyTree]], List[bool], List[Optional[int]]]:
    """Load every arrived client checkpoint and return
    (deltas, selection, sizes): the reference's load → evaluate → delta loop
    (start.py:144-164) without the shared-model aliasing bug
    (start.py:285-288). ``sizes[i]`` is the client's ``num_local_data_train``
    from checkpoint metadata (None if absent or the client never arrived) —
    callers use it as the FedAvg data-size weight (server2.py:68-81).

    ``on_error``: 'raise' propagates unreadable/malformed checkpoints (the
    one-shot driver's behavior); 'skip' treats the client as not-arrived
    for this round and logs it — the long-running service must survive a
    corrupt file (disk fault, foreign writer bypassing the atomic-rename
    protocol) without dying mid-service."""
    if on_error not in ("raise", "skip"):
        raise ValueError(f"unknown on_error policy {on_error!r}")
    # NOTE: the native thread-pool preloader (native.preload_files) was
    # wired here and MEASURED SLOWER than serial reads at 5 and 32 clients,
    # warm AND cold page cache (BENCH_NOTES round 4): ingest is dominated
    # by npz/torch PARSING (serial either way), and this disk reads at
    # GB/s with no seek penalty, so parallel IO buys nothing and the
    # buffer+BytesIO copies cost ~35%. _load_raw(data=...) keeps the bulk
    # entry point for storage where IO does dominate (true NFS).
    deltas: List[Optional[PyTree]] = []
    selection: List[bool] = []
    sizes: List[Optional[int]] = []
    # ONE batched D2H of the baseline overlay per round (a handful of leaves,
    # ~0.08 s through the tunnel for a full ViT tree — BENCH_NOTES round 2);
    # every per-client delta below is then pure-host numpy, and the caller
    # uploads the stacked result in one batched device_put. Without this,
    # n_clients × n_leaves small subtract dispatches dominated the n=32
    # ingest span (2.8–4.4 s/round measured, BENCH_NOTES round 4).
    init_host = jax.device_get(init_lora)
    for p in paths:
        if p is None:
            deltas.append(None)
            selection.append(False)
            sizes.append(None)
            continue
        try:
            sd, meta = _load_raw(p)
            lora = convert.peft_lora_to_tree(sd, spec)
        except Exception as e:
            if on_error == "raise":
                raise
            if log_fn is not None:
                log_fn(f"skipping unreadable client checkpoint {p}: {e}")
            deltas.append(None)
            selection.append(False)
            sizes.append(None)
            continue
        deltas.append(client_delta(lora, init_host))
        selection.append(True)
        n = meta.get("num_local_data_train")
        sizes.append(int(n) if n is not None else None)
    return deltas, selection, sizes
