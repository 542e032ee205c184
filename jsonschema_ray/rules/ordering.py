"""Keyword evaluation order.

The reference sorts every schema node's keyword list with a vocabulary
comparison function whose ranking is topologically generated from `after:`
constraints (reference: internal/cmd/keywordgen/sort.go:16-69; resulting
`sortRank` table pkg/draft202012/keywords.go:804-862). The semantic
constraints that matter:

- `contains` before `maxContains` / `minContains` (count note flows forward)
- `if` before `then` / `else` (condition note flows forward)
- `prefixItems` before `items` (positional coverage note flows forward)
- `properties` / `patternProperties` before `additionalProperties`
- everything before `unevaluatedItems` / `unevaluatedProperties`

We reproduce the effect with a flat rank table (a valid topological order of
the same constraint graph). Unknown keywords sort after known ones,
alphabetically, and are always valid (reference:
pkg/types/schema/schema.go:521-531).
"""

from __future__ import annotations

_ORDER = [
    # identifiers / annotations first (all always-valid)
    "$schema", "$id", "$anchor", "$dynamicAnchor", "$vocabulary", "$comment",
    "$defs", "definitions", "title", "description", "default", "deprecated",
    "readOnly", "writeOnly", "examples",
    "contentEncoding", "contentMediaType", "contentSchema",
    # leaf assertions
    "type", "enum", "const",
    "multipleOf", "maximum", "exclusiveMaximum", "minimum", "exclusiveMinimum",
    "maxLength", "minLength", "pattern",
    "maxItems", "minItems", "uniqueItems",
    "maxProperties", "minProperties", "required", "dependentRequired",
    "format",
    # in-place applicators
    "$ref", "$dynamicRef",
    "allOf", "anyOf", "oneOf", "not",
    "if", "then", "else",
    "dependentSchemas", "dependencies",
    # array applicators (contains before max/minContains)
    "prefixItems", "items", "contains", "maxContains", "minContains",
    # object applicators (properties/patternProperties before additionalProperties)
    "properties", "patternProperties", "additionalProperties", "propertyNames",
    # engine extensions (table-level; no reference analog, see SURVEY §2.6)
    "x-unique", "x-referential", "x-stats", "x-drift", "x-decode",
    # unevaluated* strictly last (keywords.go:858-859)
    "unevaluatedItems", "unevaluatedProperties",
]

_RANK = {k: i for i, k in enumerate(_ORDER)}
_UNKNOWN_RANK = len(_ORDER)


def sort_rank(keyword: str) -> int:
    return _RANK.get(keyword, _UNKNOWN_RANK)


def sort_parts(parts: list) -> list:
    """Stable-sort (keyword, value) parts by rank then name — the analog of
    Schema.Finalize (reference: pkg/types/schema/schema.go:82-86)."""
    return sorted(parts, key=lambda p: (sort_rank(p[0]), p[0]))
