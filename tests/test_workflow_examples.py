"""Validate the shipped workflow-examples against the node schemas.

The reference ships example graph JSONs (workflow-examples/*.json); ours use
the same node keys so either package's workflows load in ComfyUI. This test
checks each KEEP node instance in our examples against the real INPUT_TYPES
schema: widget count/order, value domains, and link input names.
"""
import json
import os

import pytest

from comfyui_keep_tpu import nodes as keep_nodes

WF_DIR = os.path.join(os.path.dirname(__file__), "..", "workflow-examples")

KEEP_NODE_CLASSES = keep_nodes.NODE_CLASS_MAPPINGS


def _widget_schema(cls):
    """Ordered (name, type, spec) for widget inputs (non-connection types),
    mirroring how the ComfyUI frontend builds widgets_values."""
    schema = cls.INPUT_TYPES()
    widgets = []
    connections = []
    for section in ("required", "optional"):
        for name, spec in schema.get(section, {}).items():
            typ = spec[0]
            if isinstance(typ, list) or typ in ("FLOAT", "INT", "BOOLEAN",
                                                "STRING"):
                widgets.append((name, typ,
                                spec[1] if len(spec) > 1 else {}))
            else:
                connections.append((name, typ))
    return widgets, connections


def _workflows():
    return sorted(f for f in os.listdir(WF_DIR) if f.endswith(".json"))


@pytest.mark.parametrize("fname", _workflows())
def test_workflow_keep_nodes_match_schema(fname):
    graph = json.load(open(os.path.join(WF_DIR, fname)))
    assert graph["nodes"], fname
    seen_keep = 0
    links = {l[0]: l for l in graph.get("links", [])}
    for node in graph["nodes"]:
        cls = KEEP_NODE_CLASSES.get(node["type"])
        if cls is None:  # core/third-party node (LoadImage, VHS, ...)
            continue
        seen_keep += 1
        widgets, connections = _widget_schema(cls)
        values = node.get("widgets_values", [])
        assert len(values) == len(widgets), (
            f"{fname}:{node['type']} has {len(values)} widget values, "
            f"schema defines {len(widgets)}")
        for (name, typ, spec), val in zip(widgets, values):
            if isinstance(typ, list):
                assert val in typ, f"{name}={val!r} not in {typ}"
            elif typ == "BOOLEAN":
                assert isinstance(val, bool), (name, val)
            elif typ in ("FLOAT", "INT"):
                assert isinstance(val, (int, float)), (name, val)
                if "min" in spec:
                    assert spec["min"] <= val <= spec["max"], (name, val)
        # connection inputs declared on the node must exist in the schema
        conn_names = {n for n, _ in connections}
        for inp in node.get("inputs", []):
            assert inp["name"] in conn_names, (
                f"{fname}:{node['type']} link input {inp['name']!r} "
                f"not in schema {sorted(conn_names)}")
            if inp.get("link") is not None:
                assert inp["link"] in links, (fname, inp)
    assert seen_keep >= 2, f"{fname} exercises no KEEP nodes"


def test_workflow_links_are_consistent():
    for fname in _workflows():
        graph = json.load(open(os.path.join(WF_DIR, fname)))
        node_ids = {n["id"] for n in graph["nodes"]}
        for link_id, src, src_slot, dst, dst_slot, typ in graph["links"]:
            assert src in node_ids and dst in node_ids, (fname, link_id)
