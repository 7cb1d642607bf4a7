"""Label taxonomies — the extraction vocabulary (reference index/lables.py:1-105).

Broadcast as literals into the extraction UDF; also used by the synthetic page
generator to plant typed mentions.
"""

from __future__ import annotations

ENTITY_LABELS: dict[str, list[str]] = {
    "general": [
        "PERSON", "ORG", "GPE", "LOC", "PRODUCT", "EVENT", "WORK_OF_ART",
        "LAW", "LANGUAGE", "DATE", "TIME", "PERCENT", "MONEY", "QUANTITY",
        "ORDINAL", "CARDINAL",
    ],
    "academic": [
        "Paper", "Abstract", "Method", "Result", "Conclusion",
        "Research_Question", "Hypothesis", "Experiment", "Dataset",
        "Algorithm", "Model", "Author", "Institution", "Journal",
        "Conference", "Year", "Keywords", "Scientific_Concept",
        "Technology", "Metric",
    ],
}

RELATION_LABELS: dict[str, list[str]] = {
    "general": [
        "ORG-AFF", "PART-WHOLE", "PER-SOC", "GEN-AFF", "PHYS", "ART",
        "PER-SOC", "PER-ORG", "ORG-ORG", "ORG-LOC", "LOC-LOC", "LOC-ORG",
        "LOC-PER", "PER-LOC",
    ],
    "academic": [
        "CONTAINS", "PART_OF", "PROPOSES", "EVALUATES", "PROVES", "ACHIEVES",
        "CITES", "BUILDS_ON", "COMPARES_WITH", "AUTHORED_BY",
        "AFFILIATED_WITH", "PUBLISHED_IN", "USES", "IMPROVES", "RELATES_TO",
    ],
}


def get_default_labels(document_type: str = "general") -> tuple[list[str], list[str]]:
    """Entity + relation label lists (lables.py:95-105)."""
    return ENTITY_LABELS[document_type], RELATION_LABELS[document_type]
