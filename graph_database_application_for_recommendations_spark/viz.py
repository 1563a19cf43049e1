"""Interactive-graph HTML rendering — the pyvis adapter (SURVEY.md §2.9).

The reference renders each recommendation neighborhood with pyvis
(``recommender/recommender_knn.py:82-159`` builds a ``Network`` of user
dots and rating-colored book boxes; ``streamlit_app.py:99-108`` writes it
to a temp HTML file and embeds it). pyvis is itself a thin generator of
vis-network HTML, so the Spark-side equivalent is: ``viz_export``
(operators/recommend.py) produces the (nodes, edges) DataFrames — the
engine-scope, distributed part — and this module serializes ONE
serving-sized neighborhood to a standalone vis-network page. The
``collect()`` here is the API edge (one user's graph, like the
reference's Bolt round-trip), never a corpus-scale action.

vis-network is loaded from its public CDN at the same major version the
reference vendors (vis-9.1.2); the page is otherwise self-contained.
"""

from __future__ import annotations

import html as _html
import json

from pyspark.sql import DataFrame


def _script_json(obj) -> str:
    """JSON safe to inline inside a <script> element: '</' is escaped so
    data-controlled text (book titles) can never terminate the script tag
    and inject markup; U+2028/29 break JS string literals pre-ES2019."""
    return (
        json.dumps(obj)
        .replace("</", "<\\/")
        .replace(" ", "\\u2028")
        .replace(" ", "\\u2029")
    )

_VIS_CDN = "https://unpkg.com/vis-network@9.1.2/standalone/umd/vis-network.min.js"

_TEMPLATE = """<!DOCTYPE html>
<html>
<head>
<meta charset="utf-8"/>
<title>{title}</title>
<script src="{cdn}"></script>
<style>
  #graph {{ width: 100%; height: {height}; border: 1px solid #ddd; }}
  body {{ font-family: sans-serif; margin: 1em; }}
</style>
</head>
<body>
<h3>{title}</h3>
<div id="graph"></div>
<script>
  const nodes = new vis.DataSet({nodes_json});
  const edges = new vis.DataSet({edges_json});
  // barnes_hut physics like the reference's net.barnes_hut()
  const options = {{
    physics: {{ solver: "barnesHut", stabilization: {{ iterations: 200 }} }},
    edges: {{ scaling: {{ min: 1, max: 10 }} }},
  }};
  new vis.Network(document.getElementById("graph"), {{nodes, edges}}, options);
</script>
</body>
</html>
"""


def render_html(
    nodes: DataFrame,
    edges: DataFrame,
    title: str = "Recommendation graph",
    height: str = "600px",
) -> str:
    """Render ``viz_export`` output (nodes: id/label/shape/color,
    edges: src/dst/value) to a standalone vis-network HTML page string."""
    vis_nodes = []
    for r in nodes.collect():
        node = {"id": r["id"], "label": r["label"], "shape": r["shape"]}
        if r["color"] is not None:
            node["color"] = r["color"]
        vis_nodes.append(node)
    vis_edges = [
        {
            "from": r["src"],
            "to": r["dst"],
            "value": r["value"],
            "title": str(r["value"]),
        }
        for r in edges.collect()
    ]
    return _TEMPLATE.format(
        title=_html.escape(title),
        height=_html.escape(height),
        cdn=_VIS_CDN,
        nodes_json=_script_json(vis_nodes),
        edges_json=_script_json(vis_edges),
    )


def write_html(
    nodes: DataFrame,
    edges: DataFrame,
    path: str,
    title: str = "Recommendation graph",
    height: str = "600px",
) -> str:
    """Write the rendered page to ``path`` (the streamlit_app.py:102-105
    temp-file flow) and return the path."""
    with open(path, "w", encoding="utf-8") as f:
        f.write(render_html(nodes, edges, title=title, height=height))
    return path
