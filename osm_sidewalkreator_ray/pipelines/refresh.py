"""Incremental corpus refresh — the continuous-ingestion composition.

A production corpus is not rebuilt per crawl; each new batch is folded
in. This module composes the repo's incremental primitives into the
standard refresh recipe, each stage delta-proportional by
construction:

1. **exact dedup vs corpus** — `textops.incremental_exact_dedup`
   (Bloom short-circuit; shuffle ~ |new dups| + FPR·|new|),
2. **near-dup vs corpus and within the batch** —
   `textops.incremental_minhash_pairs` (candidates scale with |new|),
   resolved greedily: a new doc is dropped iff it pairs with ANY
   existing doc, or with a smaller-id new doc that itself survives
   (the SemDeDup keep-first rule). Pair resolution runs on the
   driver — pair cardinality is O(dup rate · |new|), the distributed
   work produced the pairs,
3. **benchmark decontamination** — `textops.decontaminate_ds`
   (broadcast sorted n-gram hashes) when bench hashes are supplied,
4. **index + stats maintenance** — `search.update_inverted_index`
   (only touched term buckets rewritten) and
   `functions.aggregates.merge_agg_states` (per-lang doc counts fold
   state-vs-state), both optional.

The acceptance decision equals the from-scratch computation on the
union (tested): exact-dedup survivors match the corpus-wide rule and
the greedy near-dup rule is partition-invariant because the pair set
is.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

LANG_STATS_SPEC = {"n_docs": (None, "count")}


def refresh_corpus(existing, new, threshold: float = 0.5,
                   bench_hashes=None, index_dir: str | None = None,
                   lang_state: pd.DataFrame | None = None):
    """Fold a new crawl batch into a corpus.

    ``existing`` / ``new``: Datasets with (doc_id, text [, lang]);
    doc_ids globally unique, existing assumed internally deduped.
    Returns a dict: accepted (a lazy DATASET of surviving new rows —
    text never collects to the driver), accepted_ids (sorted list),
    dropped (doc_id, reason), lang_state (merged, when input state
    given), touched_buckets (when index_dir given). Driver state is
    O(|new ids| + |pairs|) slim values.
    """
    import ray as _ray

    from ..functions.aggregates import agg_state_ds, merge_agg_states
    from . import textops as T

    # driver state throughout is SLIM: new-batch ids, near-dup pairs
    # and drop reasons — never document text (the accepted rows stream
    # through a broadcast id-set filter and are returned as a lazy
    # Dataset).
    new_ids_arr = np.sort(
        new.select_columns(["doc_id"]).to_pandas()["doc_id"]
        .to_numpy(np.int64))
    new_ids = set(new_ids_arr.tolist())

    # 1. exact dedup vs corpus (+ within-batch exact dups)
    kept_exact = T.incremental_exact_dedup(existing, new)
    exact_ids = set(kept_exact["doc_id"].tolist())
    dropped = [(int(d), "exact_dup")
               for d in new_ids_arr if d not in exact_ids]

    # 2. near-dup pairs touching a new doc, greedy keep-first
    pairs = T.incremental_minhash_pairs(existing, new,
                                        threshold=threshold)
    neigh: dict[int, list[int]] = {}
    for a, b in pairs[["doc_a", "doc_b"]].itertuples(index=False):
        neigh.setdefault(int(a), []).append(int(b))
        neigh.setdefault(int(b), []).append(int(a))
    kept: set[int] = set()
    for d in sorted(exact_ids):
        ns = neigh.get(d, ())
        if any(n not in new_ids for n in ns):  # pairs an existing doc
            dropped.append((d, "near_dup_existing"))
            continue
        if any(n in kept and n < d for n in ns):
            dropped.append((d, "near_dup_batch"))
            continue
        kept.add(d)

    def id_filter(ids: set):
        ref = _ray.put(np.sort(np.fromiter(ids, dtype=np.int64,
                                           count=len(ids))))

        def f(b: pd.DataFrame) -> pd.DataFrame:
            keep_arr = _ray.get(ref)
            v = b["doc_id"].to_numpy(np.int64)
            idx = np.searchsorted(keep_arr, v)
            idx[idx == len(keep_arr)] = 0
            m = (keep_arr[idx] == v) if len(keep_arr) else \
                np.zeros(len(v), dtype=bool)
            return b[m]

        return f

    # 3. decontamination (optional) — streaming over the survivors,
    # only (doc_id, contaminated) flags reach the driver
    if bench_hashes is not None and kept:
        flagged = T.decontaminate_ds(
            new.map_batches(id_filter(kept), batch_format="pandas"),
            bench_hashes).to_pandas()
        bad = set(flagged.loc[flagged["contaminated"] != 0,
                              "doc_id"].astype(int).tolist())
        for d in sorted(bad):
            dropped.append((d, "contaminated"))
        kept -= bad

    accepted_ds = new.map_batches(id_filter(kept),
                                  batch_format="pandas")
    out = {"accepted": accepted_ds,
           "accepted_ids": sorted(kept),
           "dropped": pd.DataFrame(dropped,
                                   columns=["doc_id", "reason"])
           .sort_values("doc_id").reset_index(drop=True)}

    # 4. maintenance (optional). The all-duplicates batch (kept empty)
    # is the steady-state common case — the promised keys must still
    # be present: an empty delta touches no buckets and merges to the
    # unchanged input state (KeyError on result['lang_state'] was the
    # former behavior).
    if index_dir is not None:
        if kept:
            from .search import update_inverted_index
            out["touched_buckets"] = update_inverted_index(
                accepted_ds.select_columns(["doc_id", "text"]),
                index_dir)
        else:
            out["touched_buckets"] = []
    if lang_state is not None:
        if isinstance(lang_state, pd.DataFrame):
            lang_state = rd.from_pandas(lang_state)
        if kept:
            delta = agg_state_ds(accepted_ds.select_columns(["lang"]),
                                 ["lang"], LANG_STATS_SPEC)
            merged = merge_agg_states(lang_state, delta, ["lang"],
                                      LANG_STATS_SPEC)
        else:
            merged = lang_state
        out["lang_state"] = (merged.to_pandas().sort_values("lang")
                             .reset_index(drop=True))
    return out
