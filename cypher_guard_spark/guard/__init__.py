"""Pure-Python, Spark-free Cypher parser + schema validator.

Behavior parity target: neo4j-field/cypher-guard v4.0.0 (see SURVEY.md).
Public surface mirrors the reference's Python bindings.
"""

from .api import (
    check_syntax,
    get_cypher_validation_error_objects,
    get_cypher_validation_errors,
    has_parser_errors,
    has_valid_cypher,
    is_write,
    parse_query,
    parse_query_result,
    validate_cypher,
    validate_cypher_with_schema,
)
from .errors import (
    CypherParsingError,
    CypherSchemaError,
    CypherValidationError,
    InvalidClauseOrder,
    InvalidNodeLabel,
    InvalidNodeProperty,
    InvalidPropertyAccess,
    InvalidPropertyType,
    InvalidRelationship,
    InvalidRelationshipProperty,
    InvalidRelationshipType,
    MatchAfterReturn,
    MissingRequiredClause,
    NomParsingError,
    ParsingError,
    ReturnBeforeOtherClauses,
    UndefinedVariable,
    UnexpectedEndOfInput,
    UnwindAfterReturn,
    ValidationError,
    WhereBeforeMatch,
    WithAfterReturn,
)
from .schema import (
    DbSchema,
    DbSchemaConstraint,
    DbSchemaIndex,
    DbSchemaMetadata,
    DbSchemaProperty,
    DbSchemaRelationshipPattern,
)

__all__ = [
    "check_syntax",
    "get_cypher_validation_error_objects",
    "get_cypher_validation_errors",
    "has_parser_errors",
    "has_valid_cypher",
    "is_write",
    "parse_query",
    "parse_query_result",
    "validate_cypher",
    "validate_cypher_with_schema",
    "DbSchema",
    "DbSchemaConstraint",
    "DbSchemaIndex",
    "DbSchemaMetadata",
    "DbSchemaProperty",
    "DbSchemaRelationshipPattern",
    "CypherParsingError",
    "CypherSchemaError",
    "CypherValidationError",
    "ValidationError",
    "ParsingError",
]
