#!/usr/bin/env python
"""Cast trained mlearn potentials to f16 and stage them under docs/.

`runs/` is gitignored and does NOT survive round boundaries (the round-3
campaign vanished once already) — the trained potentials are the
repo's headline accuracy artifact, so the distribution copies live in
docs/mlearn_r*/<el>/best_model.mpk (VERDICT r4 next-steps #1).

f16 storage halves the file to ~8 MB and costs 5.5e-5 eV/atom /
5e-7 eV/A on the Si potential (measured; zoo.load_model_dir casts back
to the model compute dtype on restore).

    python tools/commit_potentials.py runs/mlearn_r4 docs/mlearn_r4 Si
"""

import os
import sys

import numpy as np
from flax import serialization


def commit_one(src_dir: str, dst_dir: str):
    src = os.path.join(src_dir, "best_model.mpk")
    with open(src, "rb") as f:
        payload = serialization.msgpack_restore(f.read())

    def cast(x):
        x = np.asarray(x)
        return x.astype(np.float16) if x.dtype == np.float32 else x

    import jax

    payload["params"] = jax.tree_util.tree_map(cast, payload["params"])
    meta = payload.get("meta") or {}
    meta["storage_dtype"] = "float16"
    payload["meta"] = meta
    os.makedirs(dst_dir, exist_ok=True)
    dst = os.path.join(dst_dir, "best_model.mpk")
    with open(dst, "wb") as f:
        f.write(serialization.msgpack_serialize(payload))
    # the loader needs the training config (graph build params) and,
    # when present, the species baseline next to the weights
    for aux in ("config.json", "species_baseline.json"):
        a = os.path.join(src_dir, aux)
        if os.path.exists(a):
            import shutil

            shutil.copy(a, os.path.join(dst_dir, aux))
    print(f"{dst}: {os.path.getsize(dst) / 1e6:.1f} MB")


if __name__ == "__main__":
    src_root, dst_root = sys.argv[1], sys.argv[2]
    for el in sys.argv[3:]:
        commit_one(os.path.join(src_root, el),
                   os.path.join(dst_root, el))
