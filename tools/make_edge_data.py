#!/usr/bin/env python3
"""Build an edge-case testdata dir (documents/events/embeddings with the
fixture families FIXTURES.md lists but the pinned testdata never
exercises), copying the star tables from sf0.001. Run the normal gate
against it:

    python3 tools/make_edge_data.py /tmp/edge_sf
    sbt "runMain graft.Verify /tmp/edge_sf /tmp/edge_out"
    python3 tools/local_verify.py /tmp/edge_sf /tmp/edge_out
"""
import shutil, sys

import pyarrow as pa
import pyarrow.parquet as pq

out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/edge_sf"
import os
os.makedirs(out, exist_ok=True)

# star tables unchanged
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem"]:
    shutil.copy(f"/root/testdata/sf0.001/{t}.parquet", f"{out}/{t}.parquet")

# --- documents: edge families ------------------------------------------
texts = [
    (0, "the quick fast win is a good sign", "en", "src0"),      # nominal
    (1, "", "en", "src0"),                                       # empty
    (2, "   ", "en", "src1"),                                    # whitespace
    (3, "1234 !!! ??? 5678", "en", "src1"),                      # punct/digits only
    (4, "word", "en", "src2"),                                   # single token
    (5, "slow slow slow bad error failure", "en", "src2"),       # all negative
    (6, "the quick fast win is a good sign", "en", "src3"),      # exact dup of 0
    (7, "the quick fast win is a good sign dup", "en", "src3"),  # near dup of 0
    (8, "très café naïve 中文 good", "fr", "src4"),  # unicode
    (9, "a " * 500 + "fast", "en", "src4"),                      # very long
    (10, "NOT not NoT good", "en", "src5"),                      # negation casing
    (11, "le la les et un dans", "fr", "src5"),                  # french markers
    (12, "der die das und ein nicht gut", "de", "src6"),         # german markers
    (13, "tab\tand\nnewline  spaced", "en", "src6"),             # mixed whitespace
    (14, "very good but not very bad", "en", "src7"),            # intensifier+negator
    (15, None, "en", "src7"),  # NULL text: must fingerprint/group like empty
    # PII shapes: exercises every doc_redact branch (email, URL, digits)
    (16, "contact bob.smith+x@example.invalid or https://example.invalid/a?b=1 or call 555 0100", "en", "src8"),
]
# duplicate-heavy block: 120 exact copies of one doc plus 30 of another —
# the minhash hot-bucket scenario (all copies land in the same band
# buckets); the exact-dup pre-pass must collapse them before LSH and the
# pair expansion must still emit all 120*119/2 + 30*29/2 pairs
texts += [(100 + i, "breaking news markets rally on strong earnings report today",
           "en", "dup0") for i in range(120)]
texts += [(300 + i, "weather alert heavy rain expected across the region tonight",
           "en", "dup1") for i in range(30)]
# fuzzy-levenshtein boundary block: same 32-char prefix, tails at edit
# distance 0 / 4 / 24 from the base — the lev <= 8 verify must keep the
# first two pairings and reject the third on BOTH engines; also note the
# 120-copy dup0 block above overflows dedup_fuzzy_pairs' 64-member
# prefix-block cap, so the cap filter path is live in this gate
fuzzy_prefix = "shared prefix block for fuzzy xx"  # exactly 32 chars
texts += [
    (500, fuzzy_prefix + " tail alpha beta gamma", "en", "fz"),
    (501, fuzzy_prefix + " tail alpha beta gamma", "en", "fz"),   # lev 0
    (502, fuzzy_prefix + " tail alpha bXtY gamma", "en", "fz"),   # lev ~2
    (503, fuzzy_prefix + " completely different continuation here now", "en", "fz"),  # lev > 8
]
# adversarial repeated-token near-dup pair for dedup_pair_longest_run:
# both docs are one token repeated (420x / 380x) with an IDENTICAL
# 3-token tail, so their distinct shingle sets are equal (J = 1.0 ->
# guaranteed minhash candidate pair) while the match matrix holds
# 420*380 ~ 160k cells for the single repeated token — the blowup the
# diagonal-island SQL oracle still prices but the Spark-side suffix-
# automaton kernel must answer in O(|A|+|B|). Expected longest run:
# 383 tokens (380 spams + the tail) at a_start 41, b_start 1.
texts += [
    (600, "spam " * 420 + "alpha ending one", "en", "adv"),
    (601, "spam " * 380 + "alpha ending one", "en", "adv"),
]
doc = pa.table({
    "doc_id": pa.array([t[0] for t in texts], pa.int64()),
    "text": pa.array([t[1] for t in texts], pa.string()),
    "lang": pa.array([t[2] for t in texts], pa.string()),
    "source": pa.array([t[3] for t in texts], pa.string()),
    "n_chars": pa.array([len(t[1]) if t[1] is not None else 0 for t in texts],
                        pa.int64()),
})
pq.write_table(doc, f"{out}/documents.parquet")

# --- events: ties, null json keys, same-microsecond ns values ----------
base = 1704067200_000_000_000  # 2024-01-01 UTC in ns
rows = []
for i in range(200):
    ts = base + (i // 4) * 60_000_000_000 + (i % 4) * 250  # 4 events per
    # minute, 250ns apart (same microsecond!)
    props = '{"k": %d}' % (i % 5) if i % 7 else '{"other": 1}'  # null $.k
    rows.append((i, ts, i % 3, ["view", "click", "error"][i % 3],
                 round(0.25 * (i % 40), 2), props))
# gap-fill probes (user_id % 50 == 0): user 50 has ONE event (spine of
# one hour, fill == observed), user 100 has two events 5 hours apart
# (3 silent hours forward-filled in between)
rows.append((1000, base + 3_600_000_000_000, 50, "view", 1.25, '{"k": 1}'))
rows.append((1001, base, 100, "view", 2.5, '{"k": 2}'))
rows.append((1002, base + 5 * 3_600_000_000_000, 100, "click", 7.75,
             '{"k": 3}'))
# statistics-block probes:
# - "purchase" from EVEN users only -> the parity A/B split has one
#   arm fully unconverted (z-test degenerate pool must NULL, never
#   divide by zero)
# - "signup" values all IDENTICAL and single-day -> Mann-Whitney tie
#   correction with one total tie block; welch/cusum degenerate paths
# - a lone single-event type "solo" -> n=1 groups (sd/linreg NULL,
#   cusum single day, autocorr no pairs)
for j in range(6):
    rows.append((1100 + j, base + j * 86_400_000_000_000, 2 * j, "purchase",
                 3.0, '{"k": 4}'))
for j in range(8):
    rows.append((1200 + j, base + j * 3_600_000_000_000, 7, "signup",
                 2.5, '{"k": 5}'))
rows.append((1300, base + 40_000_000_000_000, 9, "solo", 1.0, '{"k": 6}'))
# - a pair of types at the OPPOSITE ends of the |value| <= 500 envelope:
#   the Welch mean gap is ~999 units = ~1e9 micro, whose squared
#   numerator (*1000) is ~1e21 — far past int64. Pre-round-8 the t2
#   chain squared BIGINT div quotients and silently wrapped here; the
#   DECIMAL(38,0) re-widening keeps it exact (and keeps the gate
#   catching any regression back to 64-bit arithmetic).
for j in range(5):
    rows.append((1400 + j, base + j * 3_600_000_000_000, 11, "hi_pos",
                 499.5 + 0.01 * j, '{"k": 7}'))
    rows.append((1500 + j, base + j * 3_600_000_000_000, 12, "hi_neg",
                 -499.5 - 0.01 * j, '{"k": 8}'))
# - NULL-ts events MIXED with real ones for one user: Spark windows
#   order ASC nulls-FIRST while DuckDB defaults nulls-LAST, so any
#   per-user lag/lead/rank frame that fails to pin `ts IS NOT NULL`
#   (or an explicit null ordering on BOTH engines) diverges exactly
#   here — the class ADVICE r10 flagged as uncatchable before this
rows.append((1600, base + 1_000_000_000, 13, "view", 1.0, '{"k": 9}'))
rows.append((1601, None, 13, "view", 2.0, '{"k": 9}'))
rows.append((1602, base + 2_000_000_000, 13, "click", 3.0, '{"k": 9}'))
rows.append((1603, None, 13, "click", 4.0, '{"k": 9}'))
ev = pa.table({
    "event_id": pa.array([r[0] for r in rows], pa.int64()),
    "ts": pa.array([r[1] for r in rows], pa.timestamp("ns")),
    "user_id": pa.array([r[2] for r in rows], pa.int64()),
    "event_type": pa.array([r[3] for r in rows], pa.string()),
    "value": pa.array([r[4] for r in rows], pa.float64()),
    "props": pa.array([r[5] for r in rows], pa.string()),
})
pq.write_table(ev, f"{out}/events.parquet")

# --- embeddings: include a zero vector and exact duplicates ------------
import struct
def vec(seed):
    return [((seed * 31 + j * 7) % 97 - 48) / 97.0 for j in range(64)]
vecs = [vec(i) for i in range(50)]
vecs[7] = vecs[3][:]          # exact duplicate pair
vecs[9] = [0.0] * 64          # zero vector (norm 0 -> div by zero paths!)
vecs[11] = vec(11)[:32]       # ragged short vector (off the 64-dim contract)
vecs[13] = vec(13)            # null element mid-vector
vecs[13][20] = None
emb = pa.table({
    "vec_id": pa.array(list(range(50)), pa.int64()),
    "embedding": pa.array([[float(x) if x is not None else None for x in v]
                           for v in vecs],
                          pa.list_(pa.float32())),
    "label": pa.array([i % 10 for i in range(50)], pa.int32()),
})
pq.write_table(emb, f"{out}/embeddings.parquet")
print(f"edge data written to {out}")
