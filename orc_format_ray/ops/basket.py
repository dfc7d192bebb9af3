"""Co-occurrence (market-basket) mining over an item-event table.

``co_occurrence`` counts, for every unordered item pair, the number of
baskets containing BOTH items — the support table behind association
rules, "users who did X also did Y" panels, and feature cross discovery.

Shuffle inventory: per-batch Arrow-local distinct shrinks each block to its
(basket, item) pairs, ONE groupby co-locates each basket's distinct items,
the per-basket pair expansion is the vectorized ``np.triu_indices`` idiom
shared with ops/dedup.py's MinHash bucket expansion (bounded by
``max_items_per_basket`` — a viral basket would otherwise emit O(m^2)
pairs), and one final (item_a, item_b) cell groupby sums supports. Payload
columns never move.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .._rayutil import remote_args

from .fastagg import fast_groupby


def co_occurrence(ds, basket: str, item: str, min_count: int = 1,
                  max_items_per_basket: int = 4096):
    """Support counts for unordered item pairs within baskets. Returns a
    Dataset of ``(item_a, item_b, cnt)`` with ``item_a < item_b``
    (string order) and ``cnt >= min_count``. Null baskets/items drop.
    """
    from ray.data.aggregate import Sum

    def local_distinct(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "b": batch[basket].combine_chunks(),
                "i": batch[item].combine_chunks().cast(pa.string()),
            }
        ).drop_null()
        return t.group_by(["b", "i"]).aggregate([])

    pairs_in = ds.map_batches(local_distinct, batch_format="pyarrow", zero_copy_batch=True, **remote_args())
    from ray.data.aggregate import Count

    distinct = fast_groupby(
        pairs_in,
        ["b", "i"],
        Count(alias_name="__co_c__"),
    ).select_columns(["b", "i"])

    def expand(g: pd.DataFrame) -> pd.DataFrame:
        items = np.sort(g["i"].to_numpy().astype(str))
        m = len(items)
        if m > max_items_per_basket:
            raise ValueError(
                f"basket {g['b'].iloc[0]!r} holds {m} distinct items > "
                f"max_items_per_basket={max_items_per_basket}"
            )
        if m < 2:
            return pd.DataFrame({"item_a": [], "item_b": []})
        a, b = np.triu_indices(m, k=1)
        return pd.DataFrame({"item_a": items[a], "item_b": items[b]})

    expanded = distinct.groupby("b").map_groups(expand, batch_format="pandas", **remote_args())

    def cells(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["item_a", "item_b"]).aggregate([([], "count_all")])
        return g.rename_columns(["item_a", "item_b", "c"])

    support = (fast_groupby(
        expanded.map_batches(cells, batch_format="pyarrow", zero_copy_batch=True, **remote_args()),
        ["item_a", "item_b"],
        Sum("c", alias_name="cnt"),
    )
    )
    if min_count > 1:
        support = support.filter(expr=f"cnt >= {int(min_count)}")
    return support


def group_vocab_jaccard(ds, group: str = "source", column: str = "text"):
    """Vocabulary-overlap Jaccard matrix between groups — "how similar are
    these corpus sources, lexically?", the mixture-design audit. Per batch:
    distinct (group, word) cells (whitespace split, empties dropped — the
    `word_count_partial` tokenization SQL reproduces); `co_occurrence`
    with basket=word / item=group turns them into pairwise intersection
    counts (each word's group set is tiny — bounded by |groups|); per-group
    distinct-word sizes come from one more metadata groupby. jaccard =
    inter / (na + nb - inter): ONE division of exact ints, bitwise SQL
    parity. Returns a driver DataFrame (|groups|^2/2 rows)."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Count

    def cells(batch: pa.Table) -> pa.Table:
        text = batch[column]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        words = pc.split_pattern_regex(pc.utf8_trim_whitespace(text), r"\s+")
        counts = pc.list_value_length(words).to_numpy(zero_copy_only=False).astype(np.int64)
        flat = pc.list_flatten(words)
        g = batch[group].combine_chunks().take(
            pa.array(np.repeat(np.arange(len(counts)), counts), pa.int64())
        )
        t = pa.table({"word": flat, "g": g}).filter(pc.greater(pc.utf8_length(flat), 0))
        return t.group_by(["word", "g"]).aggregate([])

    cells_ds = ds.map_batches(cells, batch_format="pyarrow", zero_copy_batch=True, **remote_args())
    distinct = fast_groupby(
        cells_ds,
        ["word", "g"],
        Count(alias_name="_n"),
    ).materialize()

    inter = co_occurrence(distinct.select_columns(["word", "g"]), basket="word", item="g")
    inter_df = inter.to_pandas()
    sizes = (fast_groupby(
        distinct,
        "g",
        Count(alias_name="n"),
    ).to_pandas()
        .set_index("g")["n"].astype(np.int64)
    )
    na = inter_df["item_a"].map(sizes).to_numpy(dtype=np.int64)
    nb = inter_df["item_b"].map(sizes).to_numpy(dtype=np.int64)
    cnt = inter_df["cnt"].to_numpy(dtype=np.int64)
    out = inter_df.rename(columns={"item_a": f"{group}_a", "item_b": f"{group}_b", "cnt": "inter"})
    out["na"] = na
    out["nb"] = nb
    # ONE float division of exact ints — bitwise SQL parity
    out["jaccard"] = cnt.astype(np.float64) / (na + nb - cnt).astype(np.float64)
    return out.sort_values([f"{group}_a", f"{group}_b"]).reset_index(drop=True)


def assoc_rules(ds, basket: str, item: str, min_count: int = 1,
                max_items_per_basket: int = 4096, max_rules: int = 1 << 22):
    """Association rules over basket co-occurrence: for every ordered pair
    (antecedent -> consequent) whose unordered pair support passes
    ``min_count``,

        support    = c_ab / n_baskets
        confidence = c_ab / c_a
        lift       = (c_ab * n_baskets) / (c_a * c_b)

    with c_ab/c_a/c_b/n_baskets exact int64 DISTINCT-basket counts, the
    lift product guarded < 2^62, each factor cast to double ONCE and every
    metric a single IEEE division (bitwise vs the SQL mirror). Pair counts
    ride co_occurrence's bounded-bucket plan; item counts and n_baskets
    are metadata groupbys; the final join runs driver-side over the rule
    table (guarded by ``max_rules`` — rules are |item-vocab|^2-bounded,
    not row-bounded). Returns a driver DataFrame sorted by
    (antecedent, consequent)."""
    from ray.data.aggregate import Count

    pairs = co_occurrence(ds, basket, item, min_count=min_count,
                          max_items_per_basket=max_items_per_basket).to_pandas()
    if len(pairs) > max_rules:
        raise ValueError(f"{len(pairs)} pairs exceed max_rules={max_rules}")

    def local_distinct(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "b": batch[basket].combine_chunks(),
                "i": batch[item].combine_chunks().cast(pa.string()),
            }
        ).drop_null()
        return t.group_by(["b", "i"]).aggregate([])

    bi = ds.map_batches(local_distinct, batch_format="pyarrow", zero_copy_batch=True, **remote_args())
    distinct = fast_groupby(
        bi,
        ["b", "i"],
        Count(alias_name="__ar_c__"),
    )
    item_counts = (fast_groupby(
        distinct.select_columns(["b", "i"]),
        "i",
        Count(alias_name="c_item"),
    ).to_pandas()
    )
    n_baskets = int(fast_groupby(
        distinct.select_columns(["b"]),
        "b",
        Count(alias_name="__ar_b__"),
    ).count()
    )
    ci = dict(zip(item_counts["i"].astype(str), item_counts["c_item"].astype(int)))
    rows = []
    for _, r in pairs.iterrows():
        a, b, c_ab = str(r["item_a"]), str(r["item_b"]), int(r["cnt"])
        for ant, con in ((a, b), (b, a)):
            c_a, c_b = ci[ant], ci[con]
            if c_ab * n_baskets >= 1 << 62 or c_a * c_b >= 1 << 62:
                raise ValueError("assoc_rules: count products exceed the exact-int guard")
            rows.append(
                (
                    ant, con, c_ab, c_a, c_b,
                    float(np.float64(c_ab) / np.float64(n_baskets)),
                    float(np.float64(c_ab) / np.float64(c_a)),
                    float(np.float64(c_ab * n_baskets) / np.float64(c_a * c_b)),
                )
            )
    out = pd.DataFrame(
        rows,
        columns=["antecedent", "consequent", "c_pair", "c_ant", "c_con",
                 "support", "confidence", "lift"],
    )
    return out.sort_values(["antecedent", "consequent"]).reset_index(drop=True)
