"""Action → JSON-line serializer shared by BOTH commit paths.

The Spark-side ``Transaction`` (sources/transaction.py) and the
SparkSession-free sink committer (sources/pycommit.py) must emit
byte-identical action JSON — a nullable-map field added to one copy but
not the other would silently diverge the two commit paths (flagged in the
round-10 review). One serializer, imported by both.

Contract (reference JsonHandler.write_json_file,
kernel/src/lib.rs:754-760): omit null STRUCT fields, but preserve null
MAP entries — a NULL partition value must serialize as an explicit JSON
null in ``add.partitionValues`` or readers lose the key entirely (found
by tests/test_partition_fuzz.py).

Leaf module: importable in SparkSession-free driver hooks and executors.
"""

from __future__ import annotations

import json

#: map<string,string> action fields whose ENTRIES may be legitimately null —
#: the omit-null contract applies to struct FIELDS, not map values.
NULLABLE_MAP_FIELDS = frozenset({"partitionValues", "tags"})


def json_line(action: dict) -> str:
    """Serialize one log action as a compact JSON line."""

    def prune(obj):
        if isinstance(obj, dict):
            return {
                k: (v if k in NULLABLE_MAP_FIELDS and isinstance(v, dict) else prune(v))
                for k, v in obj.items()
                if v is not None
            }
        return obj

    return json.dumps(prune(action), separators=(",", ":"))
