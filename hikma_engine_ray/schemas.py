"""Fixed Arrow schemas for the engine's logical tables.

The reference keeps a dynamic ``properties: Record<string,any>`` bag
(reference ``src/types/index.ts:37-41``); here hot fields are typed
columns and the long tail goes into ``props_json`` (mirrors
``graph_nodes.properties`` JSON text, reference
``src/persistence/PhaseRepository.ts:175``).
"""

from __future__ import annotations

import pyarrow as pa

# Input corpus table — exactly BASELINE.json's input_hint shape.
CORPUS = pa.schema(
    [
        ("repo", pa.string()),
        ("path", pa.string()),
        ("commit", pa.string()),
        ("lang", pa.string()),
        ("content", pa.large_string()),
    ]
)

# Node vocabulary (union of the reference's active + latent extractors,
# SURVEY.md §2.11): reference src/types/index.ts:7-16 and
# src/types/enhanced-graph.ts:6-17.
NODE_TYPES = [
    "Repository",
    "Commit",
    "File",
    "Function",
    "ArrowFunction",
    "Method",
    "Class",
    "Interface",
    "Variable",
    "Import",
    "Export",
    "TestCase",
    "PullRequest",  # J6 side table (git-analyzer.ts:264-310)
]

# Predicate vocabulary (union, SURVEY.md §7.0): reference
# src/types/index.ts:18-29 + src/types/enhanced-graph.ts:20-35.
PREDICATES = [
    "CONTAINS",
    "DEFINED_IN",
    "DECLARES",
    "CALLS",
    "IMPORTS",
    "EXPORTS",
    "EXTENDS",
    "IMPLEMENTS",
    "MODIFIED_IN",
    "HAS_COMMIT",
    "AUTHORED",
    "TESTED_BY",
    "INCLUDES_COMMIT",  # J6 PR → commit
]

NODES = pa.schema(
    [
        ("node_id", pa.string()),
        ("node_type", pa.string()),
        ("repo", pa.string()),
        ("path", pa.string()),
        ("commit", pa.string()),
        ("lang", pa.string()),
        ("name", pa.string()),
        ("start_line", pa.int32()),
        ("end_line", pa.int32()),
        ("start_col", pa.int32()),
        ("signature", pa.string()),
        ("file_type", pa.string()),
        ("size_kb", pa.float32()),
        ("content_sha256", pa.string()),
        ("props_json", pa.string()),
    ]
)

TRIPLES = pa.schema(
    [
        ("subj", pa.string()),
        ("pred", pa.string()),
        ("obj", pa.string()),
        ("repo", pa.string()),
        ("line", pa.int32()),
        ("col", pa.int32()),
        ("dynamic", pa.bool_()),
        ("props_json", pa.string()),
    ]
)

# Unresolved cross-file symbol references emitted by the parser —
# the input of the entity-linking shuffle (SURVEY.md §2.4 J4). The
# reference leaves these latent as `{fileId}#{name}#unknown` keys
# (reference src/modules/enhanced-ast-parser.ts:588-604).
MENTIONS = pa.schema(
    [
        ("repo", pa.string()),
        ("module", pa.string()),  # resolved module path ('' if external)
        ("symbol", pa.string()),
        ("kind", pa.string()),  # 'call' | 'extends' | 'implements' | 'import'
        ("src_id", pa.string()),  # referencing node id (caller fn / class / file)
        ("src_file", pa.string()),
        ("line", pa.int32()),
        ("col", pa.int32()),
    ]
)

# Exported definitions — the (small) build side of the linking join.
DEFINITIONS = pa.schema(
    [
        ("repo", pa.string()),
        ("module", pa.string()),  # defining file path
        ("symbol", pa.string()),
        ("entity_id", pa.string()),
        ("entity_kind", pa.string()),
    ]
)

EMBEDDING_DIM = 384  # smallest reference model dim (embedding-service.ts:816-827)

ADJACENCY = pa.schema(
    [
        ("node_id", pa.string()),
        ("out", pa.list_(pa.struct([("pred", pa.string()), ("obj", pa.string())]))),
        ("in", pa.list_(pa.struct([("pred", pa.string()), ("subj", pa.string())]))),
    ]
)


def empty_table(schema: pa.Schema) -> pa.Table:
    return schema.empty_table()
