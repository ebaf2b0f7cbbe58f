"""Centroid builder tests: k-means quality and end-to-end recall.

The end-to-end test is the semantic heart of the whole system: build the
index from cache contents, select pages for a query, and verify the
selected pages contain the keys most similar to the query.
"""

import numpy as np

from cann_ops_adv_vllm_tpu.config import INT32_SENTINEL
from cann_ops_adv_vllm_tpu.ops.cent_select import cent_select
from cann_ops_adv_vllm_tpu.ops.clustering import (
    assign_pages,
    build_index,
    kmeans,
)

PS = 16
D = 128


def _clustered_keys(rng, h_kv, n_clusters, per_cluster, spread=0.05):
    centers = rng.standard_normal((h_kv, n_clusters, D)) * 3.0
    keys = (centers[:, :, None, :]
            + rng.standard_normal((h_kv, n_clusters, per_cluster, D))
            * spread)
    return centers, keys.reshape(h_kv, -1, D).astype(np.float32)


class TestKMeans:
    def test_recovers_separated_clusters(self, rng):
        h_kv, c = 2, 8
        centers, keys = _clustered_keys(rng, h_kv, c, 64)
        got = np.asarray(kmeans(keys, c, iters=20))
        # every true center must have a learned centroid nearby
        for h in range(h_kv):
            d = np.linalg.norm(centers[h][:, None] - got[h][None], axis=-1)
            assert np.all(d.min(axis=1) < 0.5), d.min(axis=1)

    def test_assign_pages_pure_pages(self, rng):
        """Pages whose keys all come from one cluster get that cluster."""
        h_kv, c, pages_per_cluster = 2, 4, 3
        centers, keys = _clustered_keys(rng, h_kv, c,
                                        pages_per_cluster * PS)
        p = c * pages_per_cluster
        kv = np.zeros((h_kv, p, PS, 2 * D), np.float32)
        kv[..., :D] = keys.reshape(h_kv, p, PS, D)
        cent = np.asarray(kmeans(keys, c, iters=20))
        bids = np.asarray(assign_pages(kv, cent))
        for h in range(h_kv):
            # pages of the same true cluster share an id
            ids = bids[h].reshape(c, pages_per_cluster)
            assert np.all(ids == ids[:, :1])
            # and distinct clusters get distinct ids
            assert len(set(ids[:, 0].tolist())) == c


class TestEndToEndRecall:
    def test_selection_finds_query_relevant_pages(self, rng):
        """Build index → cent_select → the pages holding keys similar to
        the query must be among the selected positions."""
        h_kv, h_q, c = 2, 4, 8
        pages_per_cluster, n_pages = 4, 32
        centers, keys = _clustered_keys(rng, h_kv, c, pages_per_cluster * PS)
        kv = np.zeros((h_kv, n_pages, PS, 2 * D), np.float32)
        kv[..., :D] = keys.reshape(h_kv, n_pages, PS, D)

        cent, bids = build_index(kv, c, iters=20)
        cent, bids = np.asarray(cent), np.asarray(bids)

        # query aligned with true cluster 2 of each kv head
        q = np.repeat(centers[:, 2:3], h_q // h_kv, axis=1).reshape(
            1, h_q, D).astype(np.float32)

        block_table = np.arange(n_pages, dtype=np.int32)[None, :]
        seq_len = np.array([n_pages * PS], np.int32)
        pos, plen, _ = cent_select(
            q, cent, bids, block_table, seq_len, k=1, block_size=PS,
            max_page_num=32, workload_cap_ratio=0,
            force_sink_and_recent=False, group_mode="per_qhead")
        pos = np.asarray(pos)

        # ground truth: pages whose keys came from cluster 2
        want_pages = set(range(2 * pages_per_cluster,
                               3 * pages_per_cluster))
        for h in range(h_q):
            got = set(p for p in pos[0, h].tolist()
                      if p != INT32_SENTINEL)
            assert want_pages <= got, (h, got, want_pages)
