"""AOT executable cache for the axon/TPU remote-compile path.

The axon backend misses jax's persistent compile cache (CLAUDE.md;
re-measured round 4), so every process pays the remote-compile service's
2-10+ min latency for the convert graph.  PJRT executable serialization
(jax.experimental.serialize_executable) DOES work across processes on
this backend (round-5 probe: deserialize 0.04 s, first exec 3.8 s,
results bit-identical) — this module keys serialized executables by the
hash of the lowered StableHLO + jax version + device kind and reloads
them instead of recompiling.

Usage (bench.py wires it behind TPUVC_AOT=1):

    fn = aot_cached(jax.jit(f), example_args, tag="convert-u8")
    out = fn(*args)          # compiled exactly once per (module, device)

Lowering (trace + StableHLO emission) always runs — it is host-side and
fast; only the PJRT compile is skipped on a hit.  The cache is
best-effort: any serialization failure falls back to a normal compile
(and says so), so this can never make a run incorrect — at worst slow.
"""

from __future__ import annotations

import hashlib
import os
import pickle

CACHE_DIR = os.environ.get("TPUVC_AOT_DIR", "/tmp/tpuvc-aot")

# Serialized convert executables are 100-220 MB each and every source
# change mints a new key, so an iteration day strands gigabytes of
# stale entries.  After each save the cache keeps only the most
# recently USED entries per tag (loads touch mtime), bounding the dir
# at ~keep x entry-size per tag.
KEEP_PER_TAG = int(os.environ.get("TPUVC_AOT_KEEP", "2"))


def _prune_tag(cache_dir: str, tag: str, keep: int) -> None:
    """Best-effort: drop all but the ``keep`` most-recent entries whose
    file name is exactly ``{tag}-{24 hex}.pkl`` (prefix matching alone
    would let one tag shadow another that extends it)."""
    try:
        entries = []
        prefix = tag + "-"
        for name in os.listdir(cache_dir):
            if (name.startswith(prefix) and name.endswith(".pkl")
                    and len(name) == len(prefix) + 24 + 4):
                path = os.path.join(cache_dir, name)
                entries.append((os.path.getmtime(path), path))
        entries.sort(reverse=True)
        for _, path in entries[keep:]:
            os.unlink(path)
    except OSError:
        pass   # concurrent prune/save; the cache stays best-effort


def enabled() -> bool:
    # Default ON since the 2026-08-19 campaign proved the round trip
    # end-to-end (cold 1337x / warm 1343x, bit-identical, compile_wall
    # 52.6 -> 3.1 s); every failure mode degrades to a plain compile.
    # TPUVC_AOT=0 opts out.
    return os.environ.get("TPUVC_AOT", "1") != "0"


def aot_cached(jitted, example_args: tuple, tag: str = "fn",
               cache_dir: str | None = None, verbose: bool = True):
    """Return a compiled executable for ``jitted`` on ``example_args``,
    loading it from the cache when the lowered module is unchanged.

    The returned object is positional-only and shape-specialized (a
    jax ``Compiled`` / loaded executable), NOT a re-traceable jit fn.
    """
    import jax
    from jax.experimental import serialize_executable as se

    cache_dir = cache_dir or CACHE_DIR
    if len(jax.devices()) != 1:
        # a deserialized executable does not re-shard uncommitted inputs
        # (measured: execute_sharded wants n-device shards on the 8-dev
        # CPU mesh) — the cache targets the single-chip serving path
        if verbose:
            print(f"[aot] {tag}: multi-device process; caching skipped",
                  flush=True)
        return jitted.lower(*example_args).compile()
    lowered = jitted.lower(*example_args)
    dev = jax.devices()[0]
    key_src = (lowered.as_text() + jax.__version__
               + getattr(dev, "device_kind", str(dev)))
    key = hashlib.sha256(key_src.encode()).hexdigest()[:24]
    path = os.path.join(cache_dir, f"{tag}-{key}.pkl")

    if os.path.exists(path):
        try:
            with open(path, "rb") as f:
                payload, in_tree, out_tree = pickle.load(f)
            loaded = se.deserialize_and_load(payload, in_tree, out_tree)
            try:
                os.utime(path)   # mark used: LRU for _prune_tag
            except OSError:
                pass
            if verbose:
                print(f"[aot] {tag}: loaded cached executable "
                      f"({len(payload) / 1e6:.1f} MB)", flush=True)
            return loaded
        except Exception as e:  # stale jaxlib, truncated file, ...
            if verbose:
                print(f"[aot] {tag}: cache load failed ({e!r}); "
                      "recompiling", flush=True)

    compiled = lowered.compile()
    try:
        os.makedirs(cache_dir, exist_ok=True)
        blob = se.serialize(compiled)
        tmp = path + f".tmp{os.getpid()}"
        with open(tmp, "wb") as f:
            pickle.dump(blob, f)
        os.replace(tmp, path)
        _prune_tag(cache_dir, tag, KEEP_PER_TAG)
        if verbose:
            print(f"[aot] {tag}: compiled + cached "
                  f"({len(blob[0]) / 1e6:.1f} MB)", flush=True)
    except Exception as e:      # backend without serialization support
        if verbose:
            print(f"[aot] {tag}: executable not serializable ({e!r}); "
                  "caching skipped", flush=True)
    return compiled
