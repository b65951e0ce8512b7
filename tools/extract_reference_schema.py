#!/usr/bin/env python
"""One-time extractor: snapshot the reference's machine-readable public-API
contract (doc_classes/*.xml — member names, types, defaults, enum constants,
methods, signals) into docs/reference_schema.json.

The snapshot is CHECKED IN; tests/test_api_schema.py diffs the live
framework surface against it so a drifting default/range fails CI instead
of waiting for a human to notice (VERDICT r4 item 6).  Re-run this script
only if the reference itself changes:

    python tools/extract_reference_schema.py [path-to-doc_classes]
"""

import glob
import json
import os
import sys
import xml.etree.ElementTree as ET

DEFAULT_SRC = "/root/reference/doc_classes"
OUT = os.path.join(os.path.dirname(__file__), "..", "docs",
                   "reference_schema.json")


def extract(src_dir: str) -> dict:
    schema = {}
    for path in sorted(glob.glob(os.path.join(src_dir, "*.xml"))):
        root = ET.parse(path).getroot()
        name = root.get("name")
        members = {}
        mnode = root.find("members")
        if mnode is not None:
            for m in mnode:
                members[m.get("name")] = {
                    "type": m.get("type"),
                    "default": m.get("default"),
                    "enum": m.get("enum"),
                }
        methods = []
        meths = root.find("methods")
        if meths is not None:
            methods = sorted(m.get("name") for m in meths)
        signals = []
        sigs = root.find("signals")
        if sigs is not None:
            signals = sorted(s.get("name") for s in sigs)
        constants = {}
        cons = root.find("constants")
        if cons is not None:
            for c in cons:
                constants[c.get("name")] = {
                    "value": c.get("value"),
                    "enum": c.get("enum"),
                }
        schema[name] = {
            "inherits": root.get("inherits"),
            "members": members,
            "methods": methods,
            "signals": signals,
            "constants": constants,
        }
    return schema


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else DEFAULT_SRC
    schema = extract(src)
    with open(os.path.abspath(OUT), "w") as f:
        json.dump(schema, f, indent=2, sort_keys=True)
        f.write("\n")
    print(f"wrote {os.path.abspath(OUT)}: {len(schema)} classes, "
          f"{sum(len(c['members']) for c in schema.values())} members, "
          f"{sum(len(c['constants']) for c in schema.values())} constants")
