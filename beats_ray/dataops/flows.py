"""Windowed / keyed aggregation over the events stream.

Models packetbeat's flow table (per-flow-key counters reported every
``period``, packetbeat/flows/flows.go:35-36, worker.go:130-139) as
event-time tumbling windows: Ray Data has no watermarks, so windows are
derived columns + groupby — the idiomatic batch re-expression.

Scale: window assignment is pure column math inside ``map_batches``;
the per-batch partial aggregation (combiner) runs BEFORE the global
groupby so the shuffle moves one row per (key, window, batch) instead
of every event (SURVEY: pre-aggregate inside map_batches).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def flow_agg(events, window_s: int = 10, buckets: int = 32):
    """Tumbling-window per-(user, event_type) counters:
    count + exact value_cents sum. Returns the aggregated Dataset.

    The global step is a BUCKETED aggregation (hash of user+window →
    int bucket → one vectorized groupby per bucket) rather than Ray's
    multi-key sort Aggregate: window keys are near-unique per event, so
    the aggregate sorts ~every partial row — sorting one int key and
    hash-aggregating per bucket is ~7× faster at sf0.1 and scales the
    same way (one co-locating shuffle either way)."""
    if buckets & (buckets - 1):
        raise ValueError(f"buckets must be a power of two, got {buckets}")

    def partial(t: pa.Table) -> pa.Table:
        # pure-Arrow partial: window math + C++ hash aggregation
        import pyarrow.compute as pc

        # unit-robust: cast to second resolution FIRST (raw int64 of a
        # timestamp[ns] column would make "seconds" actually be ms)
        sec = pc.cast(
            pc.cast(t["ts"].combine_chunks(), pa.timestamp("s"), safe=False),
            pa.int64(),
        )
        win = pc.multiply(pc.divide(sec, window_s), window_s)
        cents = pc.cast(pc.round(pc.multiply(t["value"], 100)), pa.int64())
        flat = pa.table(
            {
                "user_id": t["user_id"],
                "event_type": t["event_type"],
                "window_s": win,
                "value_cents": cents,
            }
        )
        g = flat.group_by(["user_id", "event_type", "window_s"]).aggregate(
            [([], "count_all"), ("value_cents", "sum")]
        )
        g = g.rename_columns(
            ["user_id", "event_type", "window_s", "n", "value_cents"]
        )
        uid = g["user_id"].combine_chunks()
        if pa.types.is_integer(uid.type):
            keyh = pc.fill_null(pc.cast(uid, pa.int64(), safe=False), 0)
        else:
            # non-numeric keys: vectorized FNV over the utf8 buffer
            # (hash_bucket's type-agnostic shape) — any key type works
            from ..fixtures import fnv1a32_arrow

            s = uid if pa.types.is_string(uid.type) else pc.cast(
                uid, pa.string()
            )
            keyh = pa.array(fnv1a32_arrow(s), pa.int64())
        win = pc.fill_null(g["window_s"].combine_chunks(), 0)
        bucket = pc.cast(
            pc.bit_wise_and(
                pc.add(pc.multiply(keyh, 1_000_003), win), buckets - 1
            ),
            pa.int64(),
        )
        return g.append_column("_bucket", bucket)

    def final(g: pd.DataFrame) -> pd.DataFrame:
        # dropna=False: null-keyed groups must survive like they did in
        # the Ray Sum-aggregate path (silent row loss otherwise)
        return g.groupby(
            ["user_id", "event_type", "window_s"], as_index=False,
            dropna=False,
        ).agg(n=("n", "sum"), value_cents=("value_cents", "sum"))

    partials = events.map_batches(partial, batch_format="pyarrow")
    return partials.groupby("_bucket").map_groups(final, batch_format="pandas")


def sessionize(events, gap_s: int = 1800):
    """Per-user session count with a ``gap_s`` inactivity split — the
    keyed stateful-stream archetype: hash-partition by user, sort by ts
    within group, cumulative gap count (groupby().map_groups)."""

    from .agg import map_buckets

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts"])
        same_user = g["user_id"].eq(g["user_id"].shift())
        gaps = g["ts"].diff().dt.total_seconds()
        new_session = (~same_user) | (gaps > gap_s)
        out = (
            pd.DataFrame({"user_id": g["user_id"], "s": new_session.astype("int64")})
            .groupby("user_id", as_index=False)
            .agg(n_sessions=("s", "sum"))
        )
        return out

    return map_buckets(events, "user_id", per_bucket)


def flow_sessions(events, key_cols=("user_id", "event_type"),
                  timeout_s: int = 30, buckets: int = 32):
    """Full packetbeat-flow semantics: a FLOW is a run of events for a
    key that ends after ``timeout_s`` of inactivity (flows.go:35-36
    timeout; the period-report is the windowed flow_agg above). Output:
    one row per flow with start/end epoch seconds and event count.
    Event-time re-expression: gap-split per key, vectorized per hash
    bucket."""
    from .agg import map_buckets

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        keys = list(key_cols)
        g = g.sort_values([*keys, "ts"], kind="mergesort")
        sec = g["ts"].astype("datetime64[s]").astype("int64")
        same = pd.Series(True, index=g.index)
        for c in keys:
            same &= g[c].eq(g[c].shift())
        new_flow = (~same) | ((sec - sec.shift()) > timeout_s)
        flow_id = new_flow.astype("int64").cumsum()
        out = (
            pd.DataFrame({**{c: g[c] for c in keys},
                          "flow_id": flow_id, "sec": sec})
            .groupby([*keys, "flow_id"], as_index=False)
            .agg(start_s=("sec", "min"), end_s=("sec", "max"), n=("sec", "size"))
        )
        out = out.drop(columns=["flow_id"])
        out["n"] = out["n"].astype("int64")
        return out

    return map_buckets(events, key_cols[0], per_bucket, buckets=buckets)


def top_k_users(events, k: int = 10):
    """Top-k users by event count: the partial-count combiner + the
    distributed per-block top-k (agg.grouped_count / agg.top_k_by) — the
    sort input shrinks to blocks×k rows, and the Arrow partial keeps
    NULL user_id rows counted (a pandas groupby would silently drop
    them). Deterministic (n desc, user_id asc) tie-break."""
    from .agg import grouped_count, top_k_by

    counts = grouped_count(events.select_columns(["user_id"]), ["user_id"])
    return top_k_by(counts, "n", "user_id", k)


def token_bucket_limit(events, key: str = "user_id", limit_n: int = 1,
                       per_s: int = 1, burst: int | None = None,
                       ts_col: str = "ts", order_col: str = "event_id",
                       buckets: int = 32, skew_aware: bool = False,
                       initial_state=None,
                       emit_state: bool = False,
                       gc_horizon_us: int | None = None):
    """Refilling token-bucket rate limiting — the reference's refill
    model (libbeat/processors/ratelimit/rate_limit.go:28-56,103:
    per-key bucket, capacity = burst, replenish ``limit_n / per_s``
    tokens per second of event time, spend 1 per allowed event),
    re-expressed as an event-time replay per key inside map_buckets.

    Deliberate divergence from the reference: the reference's
    ``bucket.replenish`` (token_bucket.go:63) does NOT clamp tokens at
    capacity — only its GC resets full buckets — so a long-idle key
    there can accumulate more than ``burst`` tokens and admit an
    over-capacity spike. This engine applies the textbook clamp
    ``min(cap, tok + refill)`` on every event (no unbounded credit);
    the DuckDB oracle replays the same clamped recurrence, so engine
    and oracle agree by construction.

    Exact integer math: one token = ``per_s * 1e6`` sub-units, so the
    refill over ``delta_us`` microseconds is ``limit_n * delta_us``
    sub-units — no float drift, and the DuckDB oracle's recursive CTE
    replays the identical recurrence. The clamped recurrence
    ``tok = min(cap, tok + refill) - cost`` is inherently sequential
    per key; keys replay in one tight loop per hash bucket (buckets run
    in parallel; per-key state is O(1)).

    Continuous operation: ``initial_state`` seeds the per-key buckets,
    and ``emit_state=True`` returns the segment's FINAL per-key state
    instead of the rows — the carry mechanism the streaming runner uses
    so the bucket never resets at a window boundary. The state is
    either a pandas DataFrame with columns [key, tok, last_us] (small
    state: broadcast dict via ``ray.put``, probed per bucket) or a ray
    DATASET with the same columns — the SCALE path: state rows hash
    into the SAME buckets as their keys' events (one co-locating
    shuffle, typed-Arrow null padding), so a corpus with billions of
    concurrently throttled keys never lands key-proportional state on
    the driver. With Dataset state, ``emit_state`` also carries QUIET
    seed keys (no events this segment) forward, so the caller needs no
    separate quiet-key merge.

    Emitted state is GC'd exactly like the reference (rate_limit.go
    gc): keys whose bucket is full again are dropped — a full bucket is
    indistinguishable from a fresh one. ``gc_horizon_us`` extends the
    GC to an event-time horizon (the window end): a key whose bucket
    will have refilled by the horizon is dropped too, bounding the
    carried state to genuinely in-flight keys.

    Returns the ALLOWED rows (same columns), or the state rows when
    ``emit_state`` is set (a Dataset either way — map_buckets output)."""

    import ray

    from .agg import map_buckets
    from .joins import (_arrow_types, _resolve_ref, pack_rows_state,
                        take_state_rows, union_state_rows)

    unit = per_s * 1_000_000
    cap = (burst if burst is not None else limit_n) * unit
    cost = unit
    # emit_state="both": ONE pass returns allowed rows AND final state
    # in the same output (state rows flagged ``_tb_state``, with typed
    # null padding) — the streaming runner's shape, halving the
    # per-window stage executions vs running the stage twice
    emit_both = emit_state == "both"
    both_types = _arrow_types(events) if emit_both else None
    seed_ref = None
    state_is_ds = False
    if initial_state is not None and isinstance(initial_state, pd.DataFrame):
        if len(initial_state):
            seed_ref = ray.put(
                {
                    k: (int(t), int(l))
                    for k, t, l in zip(
                        initial_state[key], initial_state["tok"],
                        initial_state["last_us"],
                    )
                }
            )
    elif initial_state is not None:
        # Dataset state: pad both sides to the combined schema (typed
        # Arrow nulls — Ray's union does not align disjoint schemas)
        # and union, so each hash bucket receives its own keys' seeds
        state_is_ds = True
        events = union_state_rows(
            events, initial_state, key, ["tok", "last_us"],
            _arrow_types(events),
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if state_is_ds:
            srows, g = take_state_rows(g, ["tok", "last_us"])
            seeds = {
                k: (int(t), int(l))
                for k, t, l in zip(
                    srows[key], srows["_st_tok"], srows["_st_last_us"]
                )
            }
        else:
            seeds = _resolve_ref(seed_ref) if seed_ref is not None else {}
        g = g.sort_values([key, ts_col, order_col], kind="mergesort")
        tus = g[ts_col].astype("datetime64[us]").astype("int64").to_numpy()
        keys = g[key].to_numpy()
        allowed = np.zeros(len(g), dtype=bool)
        state: dict = {}
        tok = 0
        last = 0
        prev = None
        for i in range(len(g)):
            kk = keys[i]
            if prev is None or kk != prev:
                if emit_state and prev is not None:
                    state[prev] = (tok, last)
                carried = seeds.get(kk)
                if carried is not None:
                    tok = min(cap, carried[0] + limit_n * (tus[i] - carried[1]))
                else:
                    tok = cap  # fresh key: bucket starts full
                prev = kk
            else:
                tok = min(cap, tok + limit_n * (tus[i] - last))
            last = tus[i]
            if tok >= cost:
                allowed[i] = True
                tok -= cost
        if emit_state and prev is not None:
            state[prev] = (tok, last)
        if emit_state:
            if state_is_ds:
                # QUIET seed keys (no events this segment) roll forward
                # with their carried (tok, last_us) — each bucket only
                # ever sees its own keys' seeds, so this stays exact
                # and distributed
                for k, tl in seeds.items():
                    if k not in state:
                        state[k] = tl
            # reference-style gc: a full bucket == a fresh bucket; with
            # a horizon, a bucket that will have refilled by then is
            # equally indistinguishable from fresh
            if gc_horizon_us is not None:
                rows = [
                    (k, t, l)
                    for k, (t, l) in state.items()
                    if t + limit_n * (gc_horizon_us - l) < cap
                ]
            else:
                rows = [
                    (k, t, l) for k, (t, l) in state.items() if t < cap
                ]
            out = pd.DataFrame(rows, columns=[key, "tok", "last_us"])
            # explicit dtypes: an empty bucket would otherwise emit
            # all-object columns, giving the state Dataset mixed block
            # schemas (breaks the distributed parquet persist)
            out["tok"] = out["tok"].astype("int64")
            out["last_us"] = out["last_us"].astype("int64")
            if not len(out):
                out[key] = out[key].astype(g[key].dtype)
            if not emit_both:
                return out
            return pack_rows_state(
                g[allowed], out, both_types, key,
                ["tok", "last_us"], "_tb_state",
            )
        return g[allowed]

    return map_buckets(events, key, per_bucket, buckets=buckets,
                       skew_aware=skew_aware)


def tb_split(both, key: str):
    """Split a ``token_bucket_limit(..., emit_state="both")`` output
    into (allowed-rows Dataset, state Dataset)."""
    from .joins import split_rows_state

    return split_rows_state(both, key, ["tok", "last_us"], "_tb_state")


def rate_limit(transcripts, k: int = 3, window_s: int = 60, buckets: int = 32,
               key_col: str = "conv_id", order_col: str = "turn_idx",
               ts_col: str = "ts", skew_aware: bool = False,
               initial_state=None, emit_state=False,
               gc_horizon_us: int | None = None):
    """Deterministic token-bucket analogue (ratelimit/rate_limit.go:103
    with per-``fields`` key bucketing): keep the first ``k`` turns per
    (key, window) in ``order_col`` order.

    Keyed stateful op via explicit hash-partition (dataops.agg
    map_buckets): one vectorized pandas pass per bucket — B python
    calls total instead of one per conversation (21k at sf0.01, millions
    at 100 TB).

    Continuous operation (mirrors ``token_bucket_limit``): a rate
    window that spans a micro-batch boundary must remember how many
    events it already admitted. ``initial_state`` seeds per-(key, win)
    admitted counts — a pandas DataFrame [key_col, win, cnt] (broadcast)
    or a Dataset with the same columns (state rows hash into their
    keys' buckets, one co-locating shuffle, nothing key-proportional on
    the driver). ``emit_state=True`` returns the final counts instead
    of rows; ``"both"`` returns rows + flagged state in one pass.
    ``gc_horizon_us`` drops windows that END before the horizon — only
    the boundary-spanning windows carry. Cross-batch exactness assumes
    ``order_col`` order is consistent with micro-batch order within a
    key (true for event-ordered streams — the same assumption the
    token-bucket replay makes)."""

    import ray

    from .agg import map_buckets
    from .joins import (_arrow_types, _resolve_ref, pack_rows_state,
                        take_state_rows, union_state_rows)

    emit_both = emit_state == "both"
    both_types = _arrow_types(transcripts) if emit_both else None
    seed_ref = None
    state_is_ds = False
    if initial_state is not None and isinstance(initial_state, pd.DataFrame):
        if len(initial_state):
            seed_ref = ray.put(
                {
                    (kk, int(wn)): int(c)
                    for kk, wn, c in zip(
                        initial_state[key_col], initial_state["win"],
                        initial_state["cnt"],
                    )
                }
            )
    elif initial_state is not None:
        state_is_ds = True
        transcripts = union_state_rows(
            transcripts, initial_state, key_col, ["win", "cnt"],
            _arrow_types(transcripts),
        )

    horizon_win = (
        None if gc_horizon_us is None
        else gc_horizon_us // (window_s * 1_000_000)
    )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if state_is_ds:
            srows, g = take_state_rows(g, ["win", "cnt"])
            seeds = {
                (kk, int(wn)): int(c)
                for kk, wn, c in zip(
                    srows[key_col], srows["_st_win"], srows["_st_cnt"]
                )
            }
        else:
            seeds = _resolve_ref(seed_ref) if seed_ref is not None else {}
        g = g.sort_values([key_col, order_col])
        win = (
            g[ts_col].astype("datetime64[s]").astype("int64") // window_s
        ).to_numpy()
        rank = g.groupby([g[key_col], win]).cumcount().to_numpy()
        if seeds:
            carry = np.array(
                [seeds.get((kk, int(wn)), 0)
                 for kk, wn in zip(g[key_col], win)],
                dtype=np.int64,
            )
            rank = rank + carry
        allowed = rank < k
        if not emit_state:
            return g[allowed]
        # final counts per (key, win): admitted this segment + carried
        kept = pd.DataFrame({"_k": g[key_col].to_numpy(), "_w": win,
                             "_a": allowed.astype(np.int64)})
        cnt = kept.groupby(["_k", "_w"], sort=False)["_a"].sum()
        # final count = admitted this segment + carried count; carried
        # windows without events this segment roll forward unchanged
        state = {
            (kk, int(wn)): int(c) + seeds.get((kk, int(wn)), 0)
            for (kk, wn), c in cnt.items()
        }
        for key_w, c in seeds.items():
            if key_w not in state:
                state[key_w] = c
        if horizon_win is not None:
            state = {
                (kk, wn): c for (kk, wn), c in state.items()
                if wn >= horizon_win
            }
        srows_out = pd.DataFrame(
            [(kk, wn, c) for (kk, wn), c in state.items()],
            columns=[key_col, "win", "cnt"],
        )
        srows_out["win"] = srows_out["win"].astype("int64")
        srows_out["cnt"] = srows_out["cnt"].astype("int64")
        if not len(srows_out):
            srows_out[key_col] = srows_out[key_col].astype(g[key_col].dtype)
        if not emit_both:
            return srows_out
        return pack_rows_state(
            g[allowed], srows_out, both_types, key_col,
            ["win", "cnt"], "_rl_state",
        )

    return map_buckets(transcripts, key_col, per_bucket, buckets=buckets,
                       skew_aware=skew_aware)


def rl_split(both, key: str):
    """Split a ``rate_limit(..., emit_state="both")`` output into
    (kept-rows Dataset, state Dataset [key, win, cnt])."""
    from .joins import split_rows_state

    return split_rows_state(both, key, ["win", "cnt"], "_rl_state")
