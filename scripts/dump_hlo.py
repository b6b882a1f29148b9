"""Dump the optimized HLO of the batched convert graph and attribute ops.

The round-5 harvest roofline leaves 24% of device time in an untagged
"other" bucket whose top ops (while.65/66 at 0 GB/s, reverse.19/20, a
~22-strong family of 1.5 ms fusions) carry NO tf_op metadata in the
xplane trace, so scripts/roofline.py cannot assign them to a pipeline
stage.  The compiled module's HLO text DOES carry per-instruction
metadata (op_name scope + source file:line) — this script compiles the
same graph roofline.py traces and greps named instructions out of it.

  python scripts/dump_hlo.py [batch] [--f0-method harvest] \
      [--ops while.65,while.66,fusion.1278] [--out /tmp/convert_hlo.txt]

With --ops it prints each match's one-line definition (including
metadata) plus, for whiles/fusions, the called computation's body ops
with THEIR metadata — enough to map an opaque trace name to source.
Always writes the full module text to --out for offline grepping.
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_compiled(batch: int, f0_method: str):
    import jax
    import jax.numpy as jnp

    from tpuvc.convert.pipeline import make_batch_convert_fn
    from tpuvc.dsp.constants import DEFAULT_WORLD
    from tpuvc.models.vae import init_params, make_model
    from tpuvc.utils.config import Architecture

    cfg = dataclasses.replace(DEFAULT_WORLD, f0_method=f0_method)
    t_samples = int(4.0 * cfg.fs)
    arch = Architecture(compute_dtype="bfloat16")
    model = make_model(arch)
    params = init_params(model, arch, jax.random.PRNGKey(0))
    base = make_batch_convert_fn(model, cfg)
    rng = np.random.default_rng(0)
    t = np.arange(t_samples) / cfg.fs
    xs = np.stack([(0.3 * np.sin(2 * np.pi * (110 + 15 * i) * t)
                    + 0.01 * rng.standard_normal(t_samples))
                   .astype(np.float32) for i in range(batch)])
    y_trgs = (np.arange(batch) % arch.y_dim).astype(np.int32)
    stats = (np.full(cfg.sp_dim, -10.0, np.float32),
             np.full(cfg.sp_dim, 1.0, np.float32),
             np.full(batch, 5.0, np.float32), np.ones(batch, np.float32),
             np.full(batch, 5.3, np.float32), np.ones(batch, np.float32))
    seeds = np.arange(batch, dtype=np.int32)
    args = (params,) + tuple(jnp.asarray(a)
                             for a in (xs, y_trgs, *stats, seeds))
    fn = jax.jit(lambda *a: base(*a))
    return fn.lower(*args).compile()


def find_op(text: str, name: str) -> None:
    """Print the definition line of %<name> plus, for a while/fusion,
    the body computation's instructions with metadata."""
    # HLO text: "  %name = type op(...), ..., metadata={...}"
    defn = re.search(rf"^\s*%?{re.escape(name)}(?:\.\d+)? = .*$", text,
                     re.M)
    # exact-name fallback: trace names match HLO names verbatim
    if defn is None:
        defn = re.search(rf"^\s*%?{re.escape(name)} = .*$", text, re.M)
    if defn is None:
        print(f"--- {name}: NOT FOUND in module text")
        return
    line = defn.group(0)
    print(f"--- {name}:")
    print("   ", line.strip()[:500])
    # pull called computations (while body/condition, fusion computation)
    for m in re.finditer(r"(?:body|condition|calls)=%?([\w.\-]+)", line):
        comp = m.group(1)
        body = re.search(rf"^%?{re.escape(comp)} [^\n]*\{{(.*?)^\}}",
                         text, re.M | re.S)
        if not body:
            continue
        ops = [ln.strip() for ln in body.group(1).splitlines()
               if "metadata=" in ln or " = " in ln]
        print(f"    computation {comp}: {len(ops)} instructions; "
              "those with metadata:")
        seen = set()
        for ln in ops:
            md = re.search(r'op_name="([^"]+)"', ln)
            if md and md.group(1) not in seen:
                seen.add(md.group(1))
                print(f"      {md.group(1)[:110]}")
        if not seen:
            for ln in ops[:8]:
                print(f"      {ln[:140]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("batch", nargs="?", type=int, default=32)
    ap.add_argument("--f0-method", default="harvest")
    ap.add_argument("--ops", default="")
    ap.add_argument("--out", default="/tmp/convert_hlo.txt")
    a = ap.parse_args()

    compiled = build_compiled(a.batch, a.f0_method)
    text = compiled.as_text()
    with open(a.out, "w") as f:
        f.write(text)
    print(f"optimized HLO: {len(text) / 1e6:.1f} MB -> {a.out}")
    for name in filter(None, a.ops.split(",")):
        find_op(text, name.strip())


if __name__ == "__main__":
    main()
