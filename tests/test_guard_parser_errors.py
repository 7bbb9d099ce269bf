"""Parser-error characterization — carried over from the reference's
rust/python_bindings/tests/unit/test_parser_errors.py."""

import pytest

from cypher_guard_spark.guard import api as cypher_guard
from cypher_guard_spark.guard.errors import (
    CypherParsingError,
    InvalidClauseOrder,
    InvalidSyntax,
    MatchAfterReturn,
    NomParsingError,
    ReturnBeforeOtherClauses,
    UnexpectedEndOfInput,
    UnwindAfterReturn,
    WhereBeforeMatch,
    WithAfterReturn,
)


class TestNomParsingErrors:
    @pytest.mark.parametrize(
        "query",
        [
            "MATCH (n RETURN n",
            "MATCH (n:Person",
            "MATCH (n:Person) INVALID",
            "MATCH (n:Person) WHERE",
            "MATCH (n:Person) RETURN n RETURN n",
            "MATCH (n:Person) ORDER BY n.name RETURN n",
            "MATCH (n:Person) RETURN n DELETE n",
            "MATCH (n:Person) RETURN n SET n.age = 30",
        ],
    )
    def test_nom_parsing_error(self, query):
        with pytest.raises(NomParsingError):
            cypher_guard.check_syntax(query)


class TestSpecificParserErrors:
    def test_return_before_other_clauses(self):
        with pytest.raises(ReturnBeforeOtherClauses):
            cypher_guard.check_syntax("RETURN n MATCH (n:Person)")

    def test_where_before_match(self):
        with pytest.raises(WhereBeforeMatch):
            cypher_guard.check_syntax("WHERE n.age > 30 MATCH (n:Person) RETURN n")

    def test_match_after_return(self):
        with pytest.raises(MatchAfterReturn):
            cypher_guard.check_syntax("MATCH (n:Person) RETURN n MATCH (m:Person)")

    def test_with_after_return(self):
        with pytest.raises(WithAfterReturn):
            cypher_guard.check_syntax("MATCH (n:Person) RETURN n WITH n")

    def test_unwind_after_return(self):
        with pytest.raises(UnwindAfterReturn):
            cypher_guard.check_syntax("MATCH (n:Person) RETURN n UNWIND [1,2,3] AS x")

    def test_invalid_clause_order_where_after_return(self):
        with pytest.raises(InvalidClauseOrder):
            cypher_guard.check_syntax("MATCH (n:Person) RETURN n WHERE n.age > 30")


class TestValidQueries:
    def test_create_after_return_is_valid(self):
        assert cypher_guard.check_syntax("MATCH (n:Person) RETURN n CREATE (m:Person)") is True

    def test_merge_after_return_is_valid(self):
        assert cypher_guard.check_syntax("MATCH (n:Person) RETURN n MERGE (m:Person)") is True

    def test_undefined_variable_is_valid_parsing(self):
        assert cypher_guard.check_syntax("MATCH (n:Person) RETURN undefined_var") is True


class TestErrorInheritance:
    def test_nom_parsing_error_inheritance(self):
        with pytest.raises(NomParsingError) as exc_info:
            cypher_guard.check_syntax("MATCH (n RETURN n")
        assert isinstance(exc_info.value, CypherParsingError)

    @pytest.mark.parametrize(
        "query,expected_error",
        [
            ("RETURN n MATCH (n:Person)", ReturnBeforeOtherClauses),
            ("WHERE n.age > 30 MATCH (n:Person) RETURN n", WhereBeforeMatch),
            ("MATCH (n:Person) RETURN n MATCH (m:Person)", MatchAfterReturn),
            ("MATCH (n:Person) RETURN n WITH n", WithAfterReturn),
            ("MATCH (n:Person) RETURN n UNWIND [1,2,3] AS x", UnwindAfterReturn),
            ("MATCH (n:Person) RETURN n WHERE n.age > 30", InvalidClauseOrder),
        ],
    )
    def test_specific_errors_inheritance(self, query, expected_error):
        with pytest.raises(expected_error) as exc_info:
            cypher_guard.check_syntax(query)
        assert isinstance(exc_info.value, CypherParsingError)


class TestErrorMessages:
    def test_nom_parsing_error_message(self):
        with pytest.raises(NomParsingError) as exc_info:
            cypher_guard.check_syntax("MATCH (n:Person")
        msg = str(exc_info.value)
        assert "Nom parsing error" in msg
        assert "error Verify" in msg or "error Tag" in msg

    def test_specific_error_messages(self):
        with pytest.raises(ReturnBeforeOtherClauses) as exc_info:
            cypher_guard.check_syntax("RETURN n MATCH (n:Person)")
        msg = str(exc_info.value)
        assert "RETURN clause must come after" in msg
        assert "line" in msg and "column" in msg

        with pytest.raises(WhereBeforeMatch) as exc_info:
            cypher_guard.check_syntax("WHERE n.age > 30 MATCH (n:Person) RETURN n")
        assert "WHERE clause must come after" in str(exc_info.value)


class TestErrorConsistency:
    def test_nom_parsing_error_consistency(self):
        invalid_query = "MATCH (n:Person) WHERE"
        for func in (cypher_guard.check_syntax, cypher_guard.is_write):
            with pytest.raises(NomParsingError):
                func(invalid_query)
        assert cypher_guard.has_parser_errors(invalid_query) is True

    def test_specific_error_consistency(self):
        invalid_query = "RETURN n MATCH (n:Person)"
        for func in (cypher_guard.check_syntax, cypher_guard.is_write):
            with pytest.raises(ReturnBeforeOtherClauses):
                func(invalid_query)
        assert cypher_guard.has_parser_errors(invalid_query) is True


class TestErrorEdgeCases:
    def test_empty_query(self):
        with pytest.raises((UnexpectedEndOfInput, NomParsingError)):
            cypher_guard.check_syntax("")

    def test_whitespace_only_query(self):
        with pytest.raises((UnexpectedEndOfInput, NomParsingError)):
            cypher_guard.check_syntax("   \n\t  ")

    def test_very_long_invalid_query(self):
        long_query = "MATCH " + "(" * 1000 + "n:Person" + ")" * 1000 + " RETURN n"
        with pytest.raises((NomParsingError, InvalidSyntax)):
            cypher_guard.check_syntax(long_query)
