"""Duplicate detection: all-pairs pHash Hamming distance on the MXU.

TPU-first reformulation of the reference's chunked numpy XOR/popcount loop
(utils/duplicate.py): encode each 64-bit hash as a +-1 vector, then the
pairwise agreement count is a single (N, 64) @ (64, N) matmul —
hamming = (64 - dot) / 2. Chunked over rows to bound memory; matches feed a
host Union-Find; each transitive group's best photo becomes the lead.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from facet_tpu.db.connection import get_connection


class UnionFind:
    def __init__(self, n):
        self.parent = list(range(n))
        self.rank = [0] * n

    def find(self, x):
        while self.parent[x] != x:
            self.parent[x] = self.parent[self.parent[x]]
            x = self.parent[x]
        return x

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra == rb:
            return
        if self.rank[ra] < self.rank[rb]:
            ra, rb = rb, ra
        self.parent[rb] = ra
        if self.rank[ra] == self.rank[rb]:
            self.rank[ra] += 1


def _hashes_to_signs(hex_hashes):
    """List of 16-char hex strings -> (N, 64) float32 in {-1, +1}."""
    n = len(hex_hashes)
    bits = np.zeros((n, 64), np.float32)
    for i, h in enumerate(hex_hashes):
        val = int(h, 16)
        for b in range(64):
            bits[i, 63 - b] = 1.0 if (val >> b) & 1 else -1.0
    return bits


@functools.partial(jax.jit, static_argnames=("max_distance",))
def _match_chunk(chunk_signs, all_signs, max_distance):
    """(C, 64) x (N, 64) -> (C, N) bool: hamming <= max_distance."""
    dots = chunk_signs @ all_signs.T            # agreements - disagreements
    hamming = (64.0 - dots) * 0.5
    return hamming <= max_distance


def find_duplicate_pairs(hex_hashes, max_distance, chunk=2048, mesh=None):
    """All (i, j<i) pairs within max_distance. Device matmul, host filter.

    With a mesh, the sign rows shard over 'dp' (the (N, 64) sign matrix
    replicates — 512 B/kilophoto — and each chip XOR-matmuls its row
    block), so the O(N^2) pHash comparison scales across chips."""
    n = len(hex_hashes)
    if n < 2:
        return []
    signs_np = _hashes_to_signs(hex_hashes)
    if mesh is not None:
        return _match_pairs_sharded(signs_np, max_distance, mesh, chunk)
    signs = jnp.asarray(signs_np)
    pairs = []
    for start in range(0, n, chunk):
        rows = signs[start:start + chunk]
        hits = np.asarray(jax.device_get(_match_chunk(rows, signs, max_distance)))
        ii, jj = np.nonzero(hits)
        for ci, j in zip(ii, jj):
            i = start + int(ci)
            if int(j) < i:
                pairs.append((int(j), i))
    return pairs


def _match_pairs_sharded(signs_np, max_distance, mesh, chunk=2048):
    """Row blocks of dp*chunk shard over 'dp'; the match matrix streams
    back block by block, like the single-device path — materializing the
    full (N, N) bool matrix would cost O(N^2) host+device memory
    (~40 GB at 200k photos; round-4 review finding)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    n = signs_np.shape[0]
    dp = mesh.shape["dp"]
    block = chunk * dp
    full = jax.device_put(jnp.asarray(signs_np), NamedSharding(mesh, P()))
    row_sharding = NamedSharding(mesh, P("dp", None))

    @functools.partial(jax.jit,
                       out_shardings=NamedSharding(mesh, P("dp", None)))
    def match(r, f):
        hamming = (64.0 - r @ f.T) * 0.5
        return hamming <= max_distance

    pairs = []
    for start in range(0, n, block):
        rows_np = signs_np[start:start + block]
        m = rows_np.shape[0]
        padded = -(-m // dp) * dp
        if padded != m:
            # zero rows match nothing: hamming 32 > any real threshold
            rows_np = np.pad(rows_np, ((0, padded - m), (0, 0)))
        rows = jax.device_put(rows_np, row_sharding)
        hits = np.asarray(jax.device_get(match(rows, full)))[:m]
        ii, jj = np.nonzero(hits)
        for ci, j in zip(ii, jj):
            i = start + int(ci)
            if int(j) < i:
                pairs.append((int(j), i))
    return pairs


def detect_duplicates(db_path, config, verbose=True):
    """Group near-identical photos and mark the best of each group as lead.

    Writes duplicate_group_id (group leader's rowid order) and
    is_duplicate_lead, clearing previous assignments. Returns group count.
    """
    settings = config.get_duplicate_detection_settings()
    similarity = settings.get("similarity_threshold_percent", 90)
    max_distance = int(64 * (1 - similarity / 100))

    with get_connection(db_path) as conn:
        rows = conn.execute(
            "SELECT path, phash, aggregate FROM photos"
            " WHERE phash IS NOT NULL ORDER BY path"
        ).fetchall()
        conn.execute("UPDATE photos SET duplicate_group_id = NULL, is_duplicate_lead = 0")
        if len(rows) < 2:
            return 0

        paths = [r["path"] for r in rows]
        aggregates = [r["aggregate"] or 0.0 for r in rows]
        pairs = find_duplicate_pairs([r["phash"] for r in rows], max_distance)

        uf = UnionFind(len(rows))
        for i, j in pairs:
            uf.union(i, j)

        groups = {}
        for idx in range(len(rows)):
            root = uf.find(idx)
            groups.setdefault(root, []).append(idx)

        group_id = 0
        for members in groups.values():
            if len(members) < 2:
                continue
            group_id += 1
            lead = max(members, key=lambda idx: aggregates[idx])
            for idx in members:
                conn.execute(
                    "UPDATE photos SET duplicate_group_id = ?, is_duplicate_lead = ?"
                    " WHERE path = ?",
                    (group_id, 1 if idx == lead else 0, paths[idx]),
                )
        if verbose:
            print(f"duplicate detection: {group_id} groups "
                  f"(similarity >= {similarity}%, hamming <= {max_distance})")
        return group_id
