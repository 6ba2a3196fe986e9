"""Minimal JSON-stat 2.0 reader (replaces the reference's pyjstat use,
data_import/thl.py): a THL pivot-API dataset → list of row dicts."""
from __future__ import annotations

import itertools
import json
from typing import Any, Dict, List, Union


def parse(payload: Union[str, bytes, dict]) -> List[Dict[str, Any]]:
    if isinstance(payload, (str, bytes)):
        data = json.loads(payload)
    else:
        data = payload
    if "dataset" in data:  # THL wraps the dataset (JSON-stat 1.x style)
        data = data["dataset"]

    dims = data.get("id") or data["dimension"]["id"]
    sizes = data.get("size") or data["dimension"]["size"]
    dimension = data["dimension"]

    labels: Dict[str, Dict[int, str]] = {}
    for d in dims:
        cat = dimension[d]["category"]
        index = cat.get("index")
        if index is None:
            keys = list(cat["label"].keys())
            order = {k: i for i, k in enumerate(keys)}
        elif isinstance(index, dict):
            order = index
        else:
            order = {k: i for i, k in enumerate(index)}
        label_map = cat.get("label", {})
        labels[d] = {pos: label_map.get(key, key)
                     for key, pos in order.items()}

    value = data["value"]
    rows = []
    for flat_idx, combo in enumerate(
            itertools.product(*[range(s) for s in sizes])):
        if isinstance(value, dict):
            v = value.get(str(flat_idx))
        else:
            v = value[flat_idx] if flat_idx < len(value) else None
        row = {d: labels[d][pos] for d, pos in zip(dims, combo)}
        row["value"] = v
        rows.append(row)
    return rows
