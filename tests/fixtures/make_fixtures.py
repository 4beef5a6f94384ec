"""Regenerate the historical-checkpoint fixtures.

The analog of the reference's upgrade tests, which build every released
version and verify `ALTER EXTENSION UPDATE` against it
(reference: pgvectorscale/tests/upgrade_test.rs:25-337).  Here every
checkpoint-format bump must leave a fixture behind:

- ``checkpoint_v2.npz``     — written by the round-2/3 (version 2) format.
- ``checkpoint_v1.npz``     — synthesized round-1 (version 1) format:
  no ``vector_dtype``/``build_distance`` config keys, f32 vectors only.
- ``expected.json``         — query results both fixtures must reproduce.

Run from the repo root on CPU:
    JAX_PLATFORMS=cpu python tests/fixtures/make_fixtures.py

Regenerate ONLY when adding a NEW version fixture; existing fixtures are
frozen artifacts — the whole point is that old files keep loading.
"""

import json
import os
import sys

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_REPO = os.path.dirname(os.path.dirname(_HERE))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def fixture_data():
    """Deterministic tiny corpus + queries shared with test_upgrade.py."""
    rng = np.random.default_rng(1234)
    vectors = rng.standard_normal((64, 16)).astype(np.float32)
    queries = rng.standard_normal((8, 16)).astype(np.float32)
    return vectors, queries


def main():
    from pgvectorscale_tpu import (
        DiskannIndex,
        DistanceType,
        IndexConfig,
        QueryParams,
    )

    vectors, queries = fixture_data()
    config = IndexConfig(
        num_dimensions=16,
        distance_type=DistanceType.L2,
        num_neighbors=10,
        search_list_size=16,
    )
    index = DiskannIndex.build(vectors, config)
    v2_path = os.path.join(_HERE, "checkpoint_v2.npz")
    index.save(v2_path)

    # Synthesize the v1 (round-1) format from the v2 file: version 1,
    # config without the keys later versions added.
    with np.load(v2_path) as z:
        payload = {k: z[k] for k in z.files}
    cfg = json.loads(bytes(payload["config"]).decode())
    cfg.pop("vector_dtype", None)
    cfg.pop("build_distance", None)
    payload["config"] = np.frombuffer(
        json.dumps(cfg).encode(), dtype=np.uint8
    )
    payload["version"] = np.int64(1)
    np.savez_compressed(os.path.join(_HERE, "checkpoint_v1.npz"), **payload)

    ids, dists = index.search(
        queries, k=5, params=QueryParams(search_list_size=32, rescore=16)
    )
    with open(os.path.join(_HERE, "expected.json"), "w") as f:
        json.dump(
            {
                "k": 5,
                "search_list_size": 32,
                "rescore": 16,
                "ids": ids.tolist(),
                "dists": [[round(float(x), 5) for x in row] for row in dists],
            },
            f,
            indent=1,
        )
    print("fixtures written to", _HERE)


if __name__ == "__main__":
    main()
