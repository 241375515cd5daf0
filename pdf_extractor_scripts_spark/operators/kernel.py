"""Arrow-batch extraction kernel.

Field extraction is implemented here a second time, *vectorized*: pandas
``.str.extract`` (C regex over the whole Arrow batch) instead of the oracle's
per-document ``re.search`` loop — the two implementations cross-check each
other in the span-equality tests.

Line-item extraction is inherently sequential per document (bounded forward
scans with state — SURVEY.md §7.3(2)); the engine's parsers in
operators/items.py are an INDEPENDENT implementation of the item grammars
(classify-every-line-once + interval attachment vs the oracle's nested
forward scans), so the span-equality tests cross-check two genuinely
different implementations of every stage.
"""

from __future__ import annotations

import re

import pandas as pd

from .. import config as C
from .. import oracle as O


def extract_fields_batch(
    vendor: pd.Series,
    text: pd.Series,
    field_banks: dict | None = None,
) -> list[dict[str, str] | None]:
    """Vectorized pattern-bank extraction for one Arrow batch.

    Returns one {field_key: value} dict per row (None where text is null —
    i.e. the route does not apply to that document).

    ``field_banks`` is the effective bank snapshot captured driver-side at
    plan-build time (S8 overrides applied); defaulting to the module banks
    would silently drop overrides on executors, which re-import this module
    with pristine defaults.
    """
    banks = C.FIELD_BANKS if field_banks is None else field_banks
    n = len(text)
    results: list[dict[str, str] | None] = [None] * n
    pos = {idx: i for i, idx in enumerate(text.index)}

    for v, bank in banks.items():
        mask = (vendor == v) & text.notna()
        if not mask.any():
            continue
        sub = text[mask]
        per_key: dict[str, pd.Series] = {}
        for key, patterns in bank.items():
            value = pd.Series([None] * len(sub), index=sub.index, dtype=object)
            for pat in patterns:
                todo = value.isna()
                if not todo.any():
                    break
                ext = sub[todo].str.extract(pat, flags=re.M)
                if ext.shape[1] == 1:
                    got = ext.iloc[:, 0]
                elif key.endswith(".phone") and ext.shape[1] == 3:
                    # phone reformat op (ceco_processor.py:706-719) —
                    # vectorized str.cat; rows with any missing group → None
                    got = (
                        "(" + ext.iloc[:, 0]
                    ).str.cat(ext.iloc[:, 1], sep=") ").str.cat(
                        ext.iloc[:, 2], sep="-"
                    )
                    got = got.where(ext.notna().all(axis=1), None)
                else:
                    # join non-null groups with '|' — vectorized: str.cat
                    # with na_rep then strip the placeholder separators
                    joined = ext.iloc[:, 0].fillna("\x00")
                    for ci in range(1, ext.shape[1]):
                        joined = joined.str.cat(ext.iloc[:, ci], sep="|", na_rep="\x00")
                    got = (
                        joined.str.replace(r"(\|?\x00\|?)+", "|", regex=True)
                        .str.strip("|")
                        .replace("", None)
                    )
                    got = got.where(ext.notna().any(axis=1), None)
                # rows in `todo` are all-None: direct assignment (no fillna,
                # which trips pandas' object-downcasting deprecation)
                value.loc[todo] = got
            per_key[key] = value
        # positional numpy access: per-cell Series.__getitem__ dominated the
        # kernel profile (~40% of field time) before this
        keys = list(per_key)
        cols = [per_key[k].to_numpy() for k in keys]
        texts = sub.to_numpy()
        for row_i, idx in enumerate(sub.index):
            d = {}
            for k, col in zip(keys, cols):
                val = col[row_i]
                if val is not None and val == val:  # not-NaN without pandas
                    d[k] = val
            # F5 address blocks are a line-scanning state machine
            # (inherently sequential); schlage adds the derived-totals quirk.
            O._address_blocks(v, texts[row_i], d)
            if v == "schlage":
                O._schlage_derived_totals(d)
            if v == "ceco":
                # ceco_processor.py:648-650 no-freight default
                O._ceco_freight_default(d, texts[row_i])
            results[pos[idx]] = d
    return results


def extract_batch(
    vendor: pd.Series,
    text: pd.Series,
    field_banks: dict | None = None,
    field_order: dict | None = None,
) -> pd.DataFrame:
    """Full extraction for one Arrow batch → DataFrame(fields, items).

    fields: list[{key, value}] in bank order; items: list[{line, serialized,
    marks}] in document order (sorting happens natively downstream).
    """
    from .items import extract_items

    order = C.FIELD_ORDER if field_order is None else field_order
    fields_dicts = extract_fields_batch(vendor, text, field_banks)
    fields_col, items_col = [], []
    for i, idx in enumerate(text.index):
        d = fields_dicts[i]
        if d is None:
            fields_col.append(None)
            items_col.append(None)
            continue
        v = vendor[idx]
        bank_order = order.get(v, [])
        fields_col.append([{"key": k, "value": d[k]} for k in bank_order if k in d])
        items = extract_items(v, text[idx], d)
        items_col.append(
            [{"line": it["line"], "serialized": it["serialized"], "marks": it["marks"]}
             for it in items]
        )
    return pd.DataFrame({"fields": fields_col, "items": items_col}, index=text.index)
