"""UnifiedJSONSchema projection: out_spans → the reference's 8-section
structured JSON document (json_schema.py:14-205) — the migration surface a
reference user expects next to the span-sequence contract.

The span sequence (field:/item/mark/info/media/rule) is the graded
contract; this module is a PROJECTION of it into the reference's
``create_structured_output`` shape: invoice_header / vendor_info /
customer_info / line_items / totals / payment_terms / shipping_info /
metadata, with None-valued fields dropped exactly like the reference's
``_clean_none_values`` (Spark's ``to_json`` omits null fields). Engine
field keys without a schema slot (quote numbers, surcharges, FOB …) land
under ``additional_fields`` keyed by their span key — the analog of the
reference's ``**kwargs`` passthrough (json_schema.py:196-199);
``processing_timestamp`` is deliberately absent (the reference stamps
``datetime.now()``, json_schema.py:180 — nondeterministic, callers stamp
it at write time).

Scale shape: ONE reference to ``out_spans`` (explode → array_sort
(collect_list) per doc), because layering one filter() HOF per projected
field over the pipeline's emission expression duplicates that
mega-expression ~30× in codegen and OOMs the JVM (measured round 2). The
explode/re-group pays one doc_id shuffle; at deployment scale this
projection runs over the COMMITTED checkpoint table read-back (a plain
parquet scan), where the emission expression is long gone and the shuffle
is the only cost.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

# engine span key → (output section, reference field name)
# (json_schema.py:14-104 dataclass fields)
FIELD_MAP: dict[str, tuple[str, str]] = {
    "header.invoice_number": ("invoice_header", "invoice_number"),
    "header.invoice_date": ("invoice_header", "invoice_date"),
    "header.order_no": ("invoice_header", "order_number"),
    "header.order_number": ("invoice_header", "order_number"),
    "header.customer_po": ("invoice_header", "customer_po"),
    "header.due_date": ("invoice_header", "due_date"),
    "vendor.name": ("vendor_info", "company_name"),
    "vendor.phone": ("vendor_info", "phone"),
    "vendor.email": ("vendor_info", "email"),
    "vendor.remit_street": ("vendor_info", "address"),
    "vendor.remit_citystate": ("vendor_info", "city_state_zip"),
    "customer.sold_to_id": ("customer_info", "sold_to_id"),
    "customer.sold_to_company": ("customer_info", "company_name"),
    "customer.bill_to_company": ("customer_info", "company_name"),
    "customer.company": ("customer_info", "company_name"),
    "customer.sold_to_street": ("customer_info", "address"),
    "customer.bill_to_street": ("customer_info", "address"),
    "customer.sold_to_citystate": ("customer_info", "city_state_zip"),
    "customer.bill_to_citystate": ("customer_info", "city_state_zip"),
    "totals.subtotal": ("totals", "subtotal"),
    "totals.discount": ("totals", "discount_amount"),
    "totals.total_sale": ("totals", "total_sale"),
    "totals.tax": ("totals", "tax"),
    "totals.shipping": ("totals", "shipping"),
    "totals.total": ("totals", "invoice_total"),
    "payment.terms": ("payment_terms", "terms"),
    "shipping.origin": ("shipping_info", "ship_from"),
    "shipping.tracking": ("shipping_info", "tracking_number"),
    "shipping.fob": ("shipping_info", "carrier"),
    "customer.ship_to_street": ("shipping_info", "ship_to"),
    "totals.freight": ("shipping_info", "freight_charge"),
}

# item serialized key → reference LineItem field (json_schema.py:48-67).
# 'qty' (generic) and 'ord' (specialized) are both quantity_ordered; 'net'
# (ceco) and 'unit' are both unit_price.
ITEM_MAP: list[tuple[str, str]] = [
    ("line", "line_number"),
    ("plant", "plant"),
    ("code", "item_code"),
    ("desc", "description"),
    ("ord", "quantity_ordered"),
    ("qty", "quantity_ordered"),
    ("shp", "quantity_shipped"),
    ("bo", "quantity_backordered"),
    ("list", "list_price"),
    ("disc", "discount_percent"),
    ("unit", "unit_price"),
    ("net", "unit_price"),
    ("ext", "extended_amount"),
]

# the reference's extraction_method vocabulary (json_schema.py:108)
_METHOD = {"text": "text_extraction", "ocr": "ocr"}


def _field(key: str) -> Column:
    """First 'field:{key}' span's text (fields are unique per doc);
    try_element_at → NULL when the doc has no such span."""
    return F.try_element_at(
        F.expr(f"transform(filter(sp, x -> x.kind = 'field:{key}'), x -> x.text)"),
        F.lit(1),
    )


def _section(name: str, keys: list[tuple[str, str]]) -> Column:
    """named_struct of reference field names for one section; later engine
    keys mapping to the same reference name only apply when the earlier one
    is absent (one vendor never emits both — coalesce is exact)."""
    by_ref: dict[str, list[str]] = {}
    for engine_key, ref_name in keys:
        by_ref.setdefault(ref_name, []).append(engine_key)
    cols = [
        F.coalesce(*[_field(k) for k in eks]).alias(ref)
        for ref, eks in by_ref.items()
    ]
    return F.struct(*cols).alias(name)


def _item_struct() -> str:
    """SQL lambda body mapping one serialized item span to the reference
    LineItem fields — regexp_extract mirrors the engine/oracle _item_field
    truncate-at-'|' convention exactly."""
    parts = []
    by_ref: dict[str, list[str]] = {}
    for skey, ref in ITEM_MAP:
        by_ref.setdefault(ref, []).append(skey)
    for ref, skeys in by_ref.items():
        exts = [
            f"nullif(regexp_extract(x.text, '(?:^|\\\\|){k}=([^|]*)', 1), '')"
            for k in skeys
        ]
        parts.append(f"coalesce({', '.join(exts)}) AS {ref}")
    return ", ".join(parts)


def to_unified_json(result: DataFrame) -> DataFrame:
    """Pipeline result (RESULT_COLS) → (doc_id, unified_json).

    ``unified_json`` is the reference's 8-section structured document as a
    JSON string; null fields are dropped (to_json ignoreNullFields, the
    _clean_none_values analog). info spans surface as ``additional_info``
    and mark spans as ``marks`` — document-level arrays, matching their
    document-level position in the span contract.
    """
    mapped = set(FIELD_MAP)
    ex = result.select(
        "doc_id", "vendor", "route", "n_pages", "extraction_confidence",
        F.explode_outer("out_spans").alias("s"),
    )
    # `order` leads the struct so array_sort restores emission order after
    # the collect_list shuffle
    agg = ex.groupBy(
        "doc_id", "vendor", "route", "n_pages", "extraction_confidence"
    ).agg(
        F.array_sort(
            F.collect_list(F.struct("s.order", "s.kind", "s.text"))
        ).alias("sp")
    )
    sections = [
        _section("invoice_header",
                 [(k, r) for k, (s, r) in FIELD_MAP.items() if s == "invoice_header"]),
        _section("vendor_info",
                 [(k, r) for k, (s, r) in FIELD_MAP.items() if s == "vendor_info"]),
        _section("customer_info",
                 [(k, r) for k, (s, r) in FIELD_MAP.items() if s == "customer_info"]),
        F.expr(
            "transform(filter(sp, x -> x.kind = 'item'), "
            f"x -> struct({_item_struct()}))"
        ).alias("line_items"),
        _section("totals",
                 [(k, r) for k, (s, r) in FIELD_MAP.items() if s == "totals"]),
        _section("payment_terms",
                 [(k, r) for k, (s, r) in FIELD_MAP.items() if s == "payment_terms"]),
        _section("shipping_info",
                 [(k, r) for k, (s, r) in FIELD_MAP.items() if s == "shipping_info"]),
        F.struct(
            F.col("doc_id").alias("pdf_path"),
            F.coalesce(
                *[F.when(F.col("route") == k, F.lit(v)) for k, v in _METHOD.items()],
                F.lit("hybrid"),
            ).alias("extraction_method"),
            F.concat(F.col("vendor"), F.lit("_processor")).alias("processor"),
            F.col("n_pages").alias("total_pages"),
            F.col("extraction_confidence").alias("confidence_score"),
        ).alias("metadata"),
        # **kwargs analog: every field key without a schema slot
        F.map_from_entries(
            F.expr(
                "filter(transform(filter(sp, x -> x.kind like 'field:%'), "
                "x -> struct(substring(x.kind, 7) as key, x.text as value)), "
                "e -> NOT array_contains(array("
                + ", ".join(f"'{k}'" for k in sorted(mapped))
                + "), e.key))"
            )
        ).alias("additional_fields"),
        F.expr("transform(filter(sp, x -> x.kind = 'info'), x -> x.text)")
        .alias("additional_info"),
        F.expr("transform(filter(sp, x -> x.kind = 'mark'), x -> x.text)")
        .alias("marks"),
    ]
    return agg.select(
        "doc_id", F.to_json(F.struct(*sections)).alias("unified_json")
    )
