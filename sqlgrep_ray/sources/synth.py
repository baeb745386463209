"""Deterministic synthetic transcripts — the flagship pipeline's input.

Generates the Parquet table of multi-turn conversation / agent transcripts
described by ``BASELINE.json`` ``input_hint``:

    conv_id: string, turn_idx: int32, role: string, text: string,
    tool: string, ts: timestamp[us]

and FIXTURES.md §F1: ~40% ftpd-shaped lines, ~20% ssh-shaped, ~20% one-line
JSON (clients shape), ~10% ``;``-separated split rows, ~10% non-matching
noise; 3 hot conversations own ~20% of all turns (skew fixture); turn_idx
contiguous per conversation; ts monotonic per conversation.

Everything is a pure function of (seed, sf): same inputs → byte-identical
table. Scale: ``rows = 6_000_000 × sf`` (sf 0.001 → 6k, 0.01 → 60k,
0.1 → 600k), matching TESTDATA.md's lineitem scale.

Output is written as MULTIPLE parquet shard files (one directory), so
Ray parallelizes the read and the checkpoint/resume layer has per-shard
lineage units.
"""

from __future__ import annotations

import os


import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42
ROWS_PER_SF = 6_000_000
CACHE_ROOT = "/tmp/graft_transcripts"

ROLES = np.array(["user", "assistant", "system", "tool"])
TOOLS = np.array(["bash", "search", "editor", "browser", "python", "none"])

# the F5-style enrich lookup: tool → (category, cost_class)
TOOL_LOOKUP_ROWS = [
    ("bash", "shell", "cheap"),
    ("search", "retrieval", "mid"),
    ("editor", "shell", "cheap"),
    ("browser", "retrieval", "expensive"),
    ("python", "compute", "mid"),
    # "none" intentionally absent → exercises left-outer misses
]

_HOSTS = np.array(
    [
        "lns-vlq-45.bru.adsl.nextra.be",
        "24-54-76-216.bflony.adelphia.net",
        "host-ip9-45.example.org",
        "dsl-189-134.example.net",
        "mail.example.com",
        "",  # empty parens ⇒ NULL hostname downstream
    ]
)
_USERS = np.array(["root", "admin", "guest", "test", "oracle", "dev"])
_DOWS = np.array(["Mon", "Tue", "Wed", "Thu", "Fri", "Sat", "Sun"])
_MONS = np.array(["Jun", "Jul"])
_NOISE_WORDS = np.array(
    ["session", "opened", "closed", "for", "check", "pass", "cron", "sudo", "kernel"]
)


def tool_lookup_table() -> pa.Table:
    cols = list(zip(*TOOL_LOOKUP_ROWS))
    return pa.table(
        {
            "tool": pa.array(cols[0], pa.string()),
            "tool_category": pa.array(cols[1], pa.string()),
            "tool_cost": pa.array(cols[2], pa.string()),
        }
    )


def _conv_layout(n_rows: int, rng: np.random.RandomState) -> tuple[np.ndarray, np.ndarray]:
    """Return (conv_idx per row, turn_idx per row) with 3 hot convs ≈20%."""
    hot_rows = int(n_rows * 0.20)
    hot_sizes = [hot_rows // 3, hot_rows // 3, hot_rows - 2 * (hot_rows // 3)]
    rest = n_rows - sum(hot_sizes)
    sizes = list(hot_sizes)
    avg = 12
    while rest > 0:
        s = int(rng.geometric(1.0 / avg))
        s = max(1, min(s, 60, rest))
        sizes.append(s)
        rest -= s
    sizes_arr = np.array(sizes, dtype=np.int64)
    conv_idx = np.repeat(np.arange(len(sizes_arr)), sizes_arr)
    ends = np.cumsum(sizes_arr)
    starts = ends - sizes_arr
    turn_idx = np.arange(n_rows, dtype=np.int64) - np.repeat(starts, sizes_arr)
    return conv_idx, turn_idx


def generate_transcripts(n_rows: int, seed: int = SEED) -> pa.Table:
    rng = np.random.RandomState(seed)
    conv_idx, turn_idx = _conv_layout(n_rows, rng)
    n_convs = int(conv_idx.max()) + 1 if n_rows else 0

    conv_id = np.array([f"conv-{k:06d}" for k in range(n_convs)])[conv_idx]
    role = ROLES[turn_idx % 4]
    tool = TOOLS[rng.randint(0, len(TOOLS), n_rows)]

    # timestamps: per-conv random start (June 2025) + per-turn 1-90 s increments
    base = np.datetime64("2025-06-01T00:00:00", "us")
    conv_start = rng.randint(0, 30 * 86400, n_convs).astype("int64")
    incr = rng.randint(1, 90, n_rows).astype("int64")
    # cumulative increments within each conversation
    cum = np.cumsum(incr)
    conv_row_start = np.zeros(n_rows, dtype=np.int64)
    first_of_conv = np.r_[True, conv_idx[1:] != conv_idx[:-1]]
    conv_base_cum = np.where(first_of_conv, cum - incr, 0)
    conv_base_cum = np.maximum.accumulate(np.where(first_of_conv, cum - incr, 0))
    within = cum - conv_base_cum
    ts = base + ((conv_start[conv_idx] + within) * 1_000_000).astype("timedelta64[us]")

    # text shapes: 40/20/20/10/10
    shape = rng.choice(5, n_rows, p=[0.40, 0.20, 0.20, 0.10, 0.10])
    ips = (
        rng.randint(1, 255, (n_rows, 4)).astype(str)
    )
    day = rng.randint(1, 29, n_rows)
    hh = rng.randint(0, 24, n_rows)
    mm = rng.randint(0, 60, n_rows)
    ss = rng.randint(0, 60, n_rows)
    year = np.full(n_rows, 2005)
    pid = rng.randint(1000, 32000, n_rows)
    host = _HOSTS[rng.randint(0, len(_HOSTS), n_rows)]
    user = _USERS[rng.randint(0, len(_USERS), n_rows)]
    dow = _DOWS[rng.randint(0, 7, n_rows)]
    mon = _MONS[rng.randint(0, 2, n_rows)]
    dev = rng.randint(100, 260, n_rows)
    ms = rng.randint(1_609_000_000_000, 1_610_000_000_000, n_rows).astype("int64")
    mac = rng.randint(0, 256, (n_rows, 6))
    has_events = rng.rand(n_rows) < 0.10
    nw = _NOISE_WORDS[rng.randint(0, len(_NOISE_WORDS), (n_rows, 4))]

    texts: list[str] = [""] * n_rows
    for i in range(n_rows):
        s = shape[i]
        if s == 0:  # ftpd
            texts[i] = (
                f"{mon[i]} {day[i]} {hh[i]:02d}:{mm[i]:02d}:{ss[i]:02d} combo "
                f"ftpd[{pid[i]}]: connection from "
                f"{ips[i,0]}.{ips[i,1]}.{ips[i,2]}.{ips[i,3]} ({host[i]}) at "
                f"{dow[i]} {mon[i]} {day[i]} {hh[i]:02d}:{mm[i]:02d}:{ss[i]:02d} "
                f"{year[i]}"
            )
        elif s == 1:  # ssh
            texts[i] = (
                f"{mon[i]} {day[i]} {hh[i]:02d}:{mm[i]:02d}:{ss[i]:02d} combo "
                f"sshd(pam_unix)[{pid[i]}]: authentication failure; "
                f"logname= uid=0 euid=0 tty=NODEVssh ruser= "
                f"rhost={host[i] or 'unknown.example.net'}  user={user[i]}"
            )
        elif s == 2:  # clients JSON
            ev = ', "events": ["started", "stopped"]' if has_events[i] else ""
            m = mac[i]
            texts[i] = (
                f'{{"timestamp": {ms[i]}, "metadata": {{"device_id": "{dev[i]}", '
                f'"mac_address": "{m[0]:02x}:{m[1]:02x}:{m[2]:02x}:{m[3]:02x}:'
                f'{m[4]:02x}:{m[5]:02x}"}}{ev}}}'
            )
        elif s == 3:  # split csv (8 fields)
            texts[i] = (
                f"{ips[i,0]}.{ips[i,1]}.{ips[i,2]}.{ips[i,3]};{host[i]};{year[i]};"
                f"{mon[i]};{day[i]};{hh[i]};{mm[i]};{ss[i]}"
            )
        else:  # noise
            texts[i] = f"{mon[i]} {day[i]} combo {nw[i,0]} {nw[i,1]} {nw[i,2]} {nw[i,3]}"

    tbl = pa.table(
        {
            "conv_id": pa.array(conv_id, pa.string()),
            "turn_idx": pa.array(turn_idx.astype(np.int32), pa.int32()),
            "role": pa.array(role, pa.string()),
            "text": pa.array(texts, pa.string()),
            "tool": pa.array(tool, pa.string()),
            "ts": pa.array(ts, pa.timestamp("us")),
        }
    )
    # log-stream order: sort by ts so conversations interleave (realistic
    # shuffle pressure for the conv_id groupby downstream)
    return tbl.sort_by("ts")


def _sf_label(sf: float) -> str:
    return f"sf{sf:g}"


# beyond ~20M rows one generated table overflows Arrow's 2 GiB string
# offsets (and the texts list gets huge), so large corpora generate in
# independent SEGMENTS: each derives from (seed + k) and gets a
# per-segment conv-id prefix so conversation keys stay globally unique.
# The single-table path is kept byte-identical for the existing scales.
SEG_ROWS = 6_000_000


def ensure_transcripts(
    sf: float, root: str = CACHE_ROOT, seed: int = SEED, force: bool = False
) -> str:
    """Idempotently materialize the transcripts shard directory for ``sf``.

    Returns the directory path. Shard size targets ~75k rows so even sf0.01
    produces ≥1 shard and sf0.1 produces 8 (per-shard lineage units).
    """
    out_dir = os.path.join(root, _sf_label(sf), "transcripts")
    done = os.path.join(out_dir, "_DONE")
    if os.path.exists(done) and not force:
        return out_dir
    n_rows = int(ROWS_PER_SF * sf)
    os.makedirs(out_dir, exist_ok=True)
    # 18.75k rows/shard: ~0.15 s of parse work per task — fine-grained
    # enough that 32 cpus stay packed even at sf0.1 (29 shards) and wave
    # quantization at larger scales stays under a few percent. Cap the
    # FILE count at ~800 though: thousands of 2-3 MB parquet files is an
    # unrealistic layout (real corpora shard at 100 MB+) and the per-file
    # metadata fetch becomes a measurable fixed cost on every read.
    shard_rows = max(18_750, -(-n_rows // 800))
    seg_rows = SEG_ROWS
    n_shards = 0
    if n_rows <= seg_rows:
        segments = [(generate_transcripts(n_rows, seed), None)]
    else:
        segments = None  # generated lazily below
    if segments is not None:
        for tbl, _ in segments:
            for i in range(max(1, (tbl.num_rows + shard_rows - 1) // shard_rows)):
                part = tbl.slice(i * shard_rows, shard_rows)
                pq.write_table(
                    part,
                    os.path.join(out_dir, f"shard-{n_shards:05d}.parquet"),
                    row_group_size=32_768,
                )
                n_shards += 1
    else:
        import pyarrow.compute as _pc

        for k, off in enumerate(range(0, n_rows, seg_rows)):
            seg_n = min(seg_rows, n_rows - off)
            tbl = generate_transcripts(seg_n, seed + 1009 * (k + 1))
            ci = tbl.schema.get_field_index("conv_id")
            tbl = tbl.set_column(
                ci,
                "conv_id",
                _pc.replace_substring(
                    tbl["conv_id"], pattern="conv-", replacement=f"conv{k}-"
                ),
            )
            for i in range(max(1, (seg_n + shard_rows - 1) // shard_rows)):
                part = tbl.slice(i * shard_rows, shard_rows)
                pq.write_table(
                    part,
                    os.path.join(out_dir, f"shard-{n_shards:05d}.parquet"),
                    row_group_size=32_768,
                )
                n_shards += 1
            del tbl
    with open(done, "w") as f:
        f.write(f"rows={n_rows} seed={seed} shards={n_shards}\n")
    return out_dir


def generate_documents(
    n_docs: int, dup_frac: float = 0.08, seed: int = SEED
) -> pa.Table:
    """Deterministic large documents corpus for the near-dup SCALE bench.

    Same shape as ``/root/testdata/sf*/documents.parquet`` (doc_id:int64,
    text:string, lang:string, source:string, n_chars:int64), but sized for
    the distributed dedup path: ``dup_frac`` of docs are planted near-copies
    of an earlier doc (original text + a 2-token suffix ⇒ jaccard far above
    0.8 at shingle_k=3 for 30-80-token docs), the rest are independent
    zipf-ish samples from a 4k-word vocabulary so accidental collisions are
    negligible. Fully vectorized: one categorical gather + Arrow
    ``binary_join_element_wise``-free list join for all rows.
    """
    import pyarrow.compute as pc

    rng = np.random.RandomState(seed)
    vocab = np.array([f"tok{i:04d}" for i in range(4000)])
    # zipf-ish: quadratic skew toward low indices (hot tokens)
    lens = rng.randint(30, 81, n_docs).astype(np.int64)
    total = int(lens.sum())
    u = rng.rand(total)
    word_idx = (u * u * len(vocab)).astype(np.int64)
    offsets = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])
    values = pa.array(vocab[word_idx], pa.string())
    if isinstance(values, pa.ChunkedArray):
        values = values.combine_chunks()
    lists = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), values)
    texts = pc.binary_join(lists, " ")

    # plant near-dups: each dup doc d copies doc src(d) < d and appends a
    # short unique suffix (keeps jaccard ≈ (L-2)/L ≥ 0.9 > threshold)
    n_dup = int(n_docs * dup_frac)
    dup_ids = rng.choice(np.arange(1, n_docs), size=n_dup, replace=False)
    src_ids = (rng.rand(n_dup) * dup_ids).astype(np.int64)
    texts_np = texts.to_numpy(zero_copy_only=False).astype(object)
    texts_np[dup_ids] = [
        f"{texts_np[s]} xsuf{i:06d} ysuf{i:06d}"
        for i, s in enumerate(src_ids.tolist())
    ]
    text_arr = pa.array(texts_np, pa.string())
    langs = np.array(["en", "de", "fr", "es", "pt"])[rng.randint(0, 5, n_docs)]
    sources = np.array(["web", "code", "chat", "wiki"])[rng.randint(0, 4, n_docs)]
    return pa.table(
        {
            "doc_id": pa.array(np.arange(n_docs, dtype=np.int64)),
            "text": text_arr,
            "lang": pa.array(langs, pa.string()),
            "source": pa.array(sources, pa.string()),
            "n_chars": pc.utf8_length(text_arr).cast(pa.int64()),
        }
    )


def ensure_documents(
    n_docs: int,
    dup_frac: float = 0.08,
    root: str = CACHE_ROOT,
    seed: int = SEED,
    force: bool = False,
) -> str:
    """Idempotently materialize the big documents corpus (sharded parquet)."""
    out_dir = os.path.join(root, f"docs_{n_docs}_{dup_frac:g}")
    done = os.path.join(out_dir, "_DONE")
    if os.path.exists(done) and not force:
        return out_dir
    tbl = generate_documents(n_docs, dup_frac, seed)
    os.makedirs(out_dir, exist_ok=True)
    shard_rows = 25_000
    n_shards = max(1, (n_docs + shard_rows - 1) // shard_rows)
    for i in range(n_shards):
        pq.write_table(
            tbl.slice(i * shard_rows, shard_rows),
            os.path.join(out_dir, f"shard-{i:05d}.parquet"),
            row_group_size=8_192,
        )
    with open(done, "w") as f:
        f.write(f"docs={n_docs} dup_frac={dup_frac} seed={seed}\n")
    return out_dir


def sf_of_dir(sf_dir: str) -> float:
    """Map a ``/root/testdata/sf0.01``-style path to its scale factor."""
    name = os.path.basename(os.path.normpath(sf_dir))
    if name.startswith("sf"):
        try:
            return float(name[2:])
        except ValueError:
            pass
    return 0.001


def transcripts_for(sf_dir: str) -> str:
    """Transcripts dir matching the driver's sf directory (deterministic)."""
    return ensure_transcripts(sf_of_dir(sf_dir))
