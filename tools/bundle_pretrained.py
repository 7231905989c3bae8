"""(Re)generate the committed pretrained-weights bundle.

For every registered fixture (isbfsar_tpu/pretrained.py `_specs`):
build/load its params (the warm params cache makes this a copy, a cold one
a full fit), serialize to ``isbfsar_tpu/assets/pretrained/<digest>.msgpack``
and write the name -> file manifest. Run after any trainer-code or budget
change that moves a fixture's cache key (tests/test_pretrained.py's
`verify()` pin fails until you do).

    python tools/bundle_pretrained.py [--only NAME ...] [--cpu]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--only", nargs="*", default=None,
                        help="subset of entry names to rebuild")
    parser.add_argument("--cpu", action="store_true",
                        help="pin jax to CPU (this box's sitecustomize "
                             "force-registers the TPU relay otherwise)")
    args = parser.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import numpy as np
    from flax import serialization

    from isbfsar_tpu import pretrained
    from isbfsar_tpu.utils.cache import params_cache_digest

    out_dir = pretrained.bundle_dir()
    os.makedirs(out_dir, exist_ok=True)
    manifest_path = os.path.join(out_dir, pretrained.MANIFEST_NAME)
    manifest = pretrained._manifest()

    for name, spec in pretrained._specs().items():
        if args.only and name not in args.only:
            continue
        digest = params_cache_digest(spec.key(), spec.version)
        path = os.path.join(out_dir, f"{digest}.msgpack")
        if os.path.exists(path):
            print(f"[bundle] {name}: fresh ({digest})")
        else:
            print(f"[bundle] {name}: building ({digest})...", flush=True)
            params = jax.tree.map(np.asarray, spec.builder())
            tmp = f"{path}.tmp.{os.getpid()}"
            with open(tmp, "wb") as f:
                f.write(serialization.msgpack_serialize(params))
            os.replace(tmp, path)
            print(f"[bundle] {name}: wrote {os.path.getsize(path)} bytes")
        old = manifest.get(name, {}).get("file")
        if old and old != f"{digest}.msgpack":
            stale = os.path.join(out_dir, old)
            if os.path.exists(stale):
                os.remove(stale)
                print(f"[bundle] {name}: removed stale {old}")
        manifest[name] = {"file": f"{digest}.msgpack",
                          "description": spec.description}

    with open(manifest_path, "w") as f:
        json.dump(manifest, f, indent=2, sort_keys=True)
    print(f"[bundle] manifest -> {manifest_path}")
    print(f"[bundle] verify: {sorted(pretrained.verify())}")


if __name__ == "__main__":
    main()
