"""Historical-checkpoint upgrade tests.

The analog of the reference's upgrade suite, which builds every released
extension version, creates an index with it, runs ``ALTER EXTENSION
UPDATE``, and re-verifies queries (reference:
pgvectorscale/tests/upgrade_test.rs:25-337).  Here the contract is the
checkpoint format: every on-disk fixture written by an old format version
must keep loading through ``_migrate_checkpoint`` and answer queries
identically (fixtures + expected results committed under
``tests/fixtures/``; regenerate with ``make_fixtures.py`` ONLY when adding
a new version).
"""

import json
import os
import sys

import numpy as np
import pytest

from pgvectorscale_tpu import DiskannIndex, QueryParams
from pgvectorscale_tpu.config import CHECKPOINT_VERSION

FIXTURES = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")
if FIXTURES not in sys.path:
    sys.path.insert(0, FIXTURES)
from make_fixtures import fixture_data  # noqa: E402
_VERSIONS = [1, 2, 3]


def _expected():
    with open(os.path.join(FIXTURES, "expected.json")) as f:
        return json.load(f)


@pytest.mark.parametrize("version", _VERSIONS)
def test_historical_checkpoint_loads_and_searches(version):
    """Every committed old-format fixture loads and reproduces the exact
    search results recorded when it was written (upgrade_test.rs:141-176
    re-verifies queries after ALTER EXTENSION UPDATE)."""
    path = os.path.join(FIXTURES, f"checkpoint_v{version}.npz")
    index = DiskannIndex.load(path)
    assert index.count == 64

    _, queries = fixture_data()
    exp = _expected()
    ids, dists = index.search(
        queries,
        k=exp["k"],
        params=QueryParams(
            search_list_size=exp["search_list_size"], rescore=exp["rescore"]
        ),
    )
    np.testing.assert_array_equal(ids, np.asarray(exp["ids"]))
    np.testing.assert_allclose(
        dists, np.asarray(exp["dists"]), rtol=1e-4, atol=1e-4
    )


def test_all_released_versions_have_fixtures():
    """Every checkpoint version up to the current one must have a committed
    fixture — a format bump without a fixture fails here, the way the
    reference's upgrade matrix lists every released version
    (upgrade_test.rs:25-60)."""
    for version in range(1, CHECKPOINT_VERSION + 1):
        assert os.path.exists(
            os.path.join(FIXTURES, f"checkpoint_v{version}.npz")
        ), f"missing fixture for checkpoint version {version}"


def test_all_versions_answer_identically():
    """The migration chain is content-preserving: every fixture holds the
    same index, so searches must agree exactly across all versions."""
    _, queries = fixture_data()
    pa = QueryParams(search_list_size=32, rescore=16)
    results = []
    for version in _VERSIONS:
        idx = DiskannIndex.load(
            os.path.join(FIXTURES, f"checkpoint_v{version}.npz")
        )
        results.append(idx.search(queries, k=5, params=pa))
    ids0, d0 = results[0]
    for ids, d in results[1:]:
        np.testing.assert_array_equal(ids0, ids)
        np.testing.assert_allclose(d0, d, rtol=0, atol=0)


def test_future_version_rejected(tmp_path):
    """A checkpoint from a NEWER format version must be refused, matching
    the meta-page version check (meta_page.rs:399-419)."""
    src = os.path.join(FIXTURES, "checkpoint_v2.npz")
    with np.load(src) as z:
        payload = {k: z[k] for k in z.files}
    payload["version"] = np.int64(CHECKPOINT_VERSION + 1)
    bad = tmp_path / "future.npz"
    np.savez_compressed(bad, **payload)
    with pytest.raises(ValueError, match="newer than supported"):
        DiskannIndex.load(str(bad))


def test_not_a_checkpoint_rejected(tmp_path):
    bad = tmp_path / "junk.npz"
    np.savez_compressed(bad, magic=np.int64(0x1234), version=np.int64(1))
    with pytest.raises(ValueError, match="not a pgvectorscale_tpu"):
        DiskannIndex.load(str(bad))
