"""jsonschema_ray — a Ray-Data-native schema + constraint validation engine.

Built from scratch against the behavior of altshiftab/jsonschema (a Go JSON
Schema draft-2020-12 validator library, surveyed in SURVEY.md): declarative
rule sets compiled once on the driver to vectorized Arrow-compute predicates,
evaluated inside ``Dataset.map_batches`` with zero-copy batches, plus the
table-level checks a row-at-a-time validator cannot express (column stats,
uniqueness, referential, drift) and large-scale training-data operators
(dedup, similarity search, text analysis).
"""

from .formats import register_format
from .rules.builder import (RuleSetBuilder, infer_from_type, infer_ruleset,
                            infer_ruleset_from_type, infer_schema_doc)
from .rules.extensions import (apply_defaults, register_keyword,
                               unregister_keyword)
from .rules.meta import check_ruleset
from .rules.model import RuleSet, RuleSetError, parse_ruleset
from .rules.output import (basic_output, basic_output_column,
                           detailed_output, flag_output, verbose_output)
from .joins import asof_join, range_agg_join
from .rules.rowwise import RowEvaluator, Violation
from .rules.vector import BatchValidator


def validate_instance(schema, instance, validate_format: bool = True):
    """One-shot per-instance validation — the reference's primary entry
    point (jsonschema.New(...).Validate(instance), schema.go:711-748):
    returns a list of Violations (empty = valid). For tables, use
    BatchValidator / stages.validate_dataset; this is the row-oriented
    compatibility face."""
    rs = schema if isinstance(schema, RuleSet) else parse_ruleset(schema)
    return RowEvaluator(rs, validate_format=validate_format) \
        .validate(instance)

__all__ = [
    "validate_instance",
    "asof_join", "range_agg_join",
    "basic_output", "basic_output_column", "flag_output",
    "detailed_output", "verbose_output",
    "RuleSet", "RuleSetError", "parse_ruleset",
    "RowEvaluator", "Violation", "BatchValidator",
    "register_format", "register_keyword", "unregister_keyword",
    "apply_defaults", "check_ruleset",
    "RuleSetBuilder", "infer_ruleset", "infer_schema_doc",
    "infer_from_type", "infer_ruleset_from_type",
]
