"""Infiscript DSL tests (reference: FilterParserTests, FilterParserErrorTests,
BytecodeVMTests, TernaryFilterTests, FilterTests)."""

import pytest

from infidex_tpu import (CompositeFilter, DocumentFields, Filter,
                         FilterBuilder, FilterParseException, InFilter,
                         NullFilter, RangeFilter, RegexFilter, StringFilter,
                         TernaryFilter, ValueFilter)
from infidex_tpu.filtering.compiler import FilterCompiler, Opcode
from infidex_tpu.filtering.serializer import (deserialize, is_valid_bytecode,
                                              serialize)
from infidex_tpu.filtering.vm import FilterVM


def fields(**kwargs) -> DocumentFields:
    f = DocumentFields()
    for k, v in kwargs.items():
        f.add_field(k, v, indexable=False, filterable=True)
    return f


def run(expr_or_filter, **doc) -> bool:
    flt = (Filter.parse(expr_or_filter) if isinstance(expr_or_filter, str)
           else expr_or_filter)
    compiled = FilterCompiler().compile(flt)
    return FilterVM().execute(compiled, fields(**doc))


class TestParser:
    def test_equality(self):
        f = Filter.parse("genre = 'Fantasy'")
        assert isinstance(f, ValueFilter)
        assert f.field_name == "genre"
        assert f.value == "Fantasy"

    def test_not_equal(self):
        f = Filter.parse("genre != 'Fantasy'")
        assert isinstance(f, CompositeFilter)

    def test_comparison_operators(self):
        for expr in ["year > 2000", "year >= 2000", "year < 2000", "year <= 2000"]:
            assert isinstance(Filter.parse(expr), RangeFilter)

    def test_in(self):
        f = Filter.parse("genre IN ('Fantasy', 'SciFi')")
        assert isinstance(f, InFilter)
        assert f.values == ["Fantasy", "SciFi"]

    def test_between(self):
        f = Filter.parse("year BETWEEN 1990 AND 2000")
        assert isinstance(f, RangeFilter)
        assert f.min_value == "1990" and f.max_value == "2000"

    def test_string_operators(self):
        assert isinstance(Filter.parse("title CONTAINS 'Harry'"), StringFilter)
        assert isinstance(Filter.parse("title STARTS WITH 'The'"), StringFilter)
        assert isinstance(Filter.parse("email ENDS WITH '@x.com'"), StringFilter)
        assert isinstance(Filter.parse("title LIKE '%Potter%'"), StringFilter)

    def test_matches_regex(self):
        assert isinstance(Filter.parse(r"isbn MATCHES '^\d+$'"), RegexFilter)

    def test_null_checks(self):
        f = Filter.parse("description IS NULL")
        assert isinstance(f, NullFilter) and f.is_null
        f = Filter.parse("description IS NOT NULL")
        assert isinstance(f, NullFilter) and not f.is_null

    def test_boolean_aliases(self):
        for expr in ["a = '1' AND b = '2'", "a = '1' && b = '2'", "a = '1' & b = '2'"]:
            f = Filter.parse(expr)
            assert isinstance(f, CompositeFilter)
        for expr in ["a = '1' OR b = '2'", "a = '1' || b = '2'", "a = '1' | b = '2'"]:
            assert isinstance(Filter.parse(expr), CompositeFilter)

    def test_not_aliases(self):
        for expr in ["NOT a = '1'", "! a = '1'", "not a = '1'"]:
            assert isinstance(Filter.parse(expr), CompositeFilter)

    def test_precedence_or_lower_than_and(self):
        # a OR b AND c == a OR (b AND c)
        f = Filter.parse("a = '1' OR b = '2' AND c = '3'")
        assert f.operator.value == "Or"

    def test_parentheses(self):
        f = Filter.parse("(a = '1' OR b = '2') AND c = '3'")
        assert f.operator.value == "And"

    def test_ternary(self):
        f = Filter.parse("a = '1' ? b = '2' : c = '3'")
        assert isinstance(f, TernaryFilter)

    def test_case_insensitive_keywords(self):
        assert isinstance(Filter.parse("a in ('x')"), InFilter)
        assert isinstance(Filter.parse("a between 1 and 2"), RangeFilter)


class TestParserErrors:
    @pytest.mark.parametrize("expr", [
        "", "   ", "= 'x'", "field =", "field", "a = '1') ",
        "(a = '1'", "a IN 'x'", "a BETWEEN 1", "a BETWEEN 1 OR 2",
        "a STARTS 'x'", "field @ 'x'", "a = 'unterminated",
        "a = '1' ? b = '2'",
    ])
    def test_malformed(self, expr):
        with pytest.raises((FilterParseException, ValueError)):
            Filter.parse(expr)

    def test_error_has_position_and_hint(self):
        with pytest.raises(FilterParseException) as e:
            Filter.parse("genre ~ 'x'")
        assert "Suggestion" in str(e.value)


class TestVM:
    def test_eq_case_insensitive(self):
        assert run("genre = 'FANTASY'", genre="fantasy")

    def test_neq(self):
        assert run("genre != 'Horror'", genre="Fantasy")
        assert not run("genre != 'Fantasy'", genre="Fantasy")

    def test_numeric_comparison(self):
        assert run("year > 2000", year=2005)
        assert not run("year > 2000", year=1999)
        assert run("year >= 2000", year=2000)
        assert run("year <= 2000", year=2000)
        assert not run("year < 2000", year=2000)

    def test_numeric_vs_string_values(self):
        # "10" > "9" numerically even though "10" < "9" as strings
        assert run("n > 9", n="10")

    def test_between(self):
        assert run("year BETWEEN 1990 AND 2000", year=1995)
        assert run("year BETWEEN 1990 AND 2000", year=1990)
        assert not run("year BETWEEN 1990 AND 2000", year=2001)

    def test_in(self):
        assert run("genre IN ('Fantasy', 'SciFi')", genre="SciFi")
        assert not run("genre IN ('Fantasy', 'SciFi')", genre="Horror")

    def test_string_ops(self):
        assert run("title CONTAINS 'arry'", title="Harry Potter")
        assert run("title STARTS WITH 'harry'", title="Harry Potter")
        assert run("title ENDS WITH 'potter'", title="Harry Potter")
        assert run("title LIKE '%Pott%'", title="Harry Potter")
        assert run("title LIKE 'H_rry%'", title="Harry Potter")
        assert not run("title LIKE 'Potter'", title="Harry Potter")

    def test_regex(self):
        assert run(r"isbn MATCHES '^\d{3}$'", isbn="123")
        assert not run(r"isbn MATCHES '^\d{3}$'", isbn="12a")

    def test_invalid_regex_ctor_raises(self):
        # RegexFilter ctor validates the pattern (RegexFilter.cs:17-24)
        with pytest.raises(ValueError):
            Filter.parse("x MATCHES '['")

    def test_invalid_regex_in_bytecode_is_false(self):
        # The VM itself returns false on an invalid pattern (FilterVM.cs:268-281)
        from infidex_tpu.filtering.compiler import (CompiledFilter,
                                                    ConstantPool, Instruction)
        pool = ConstantPool()
        f_idx = pool.add_string("x")
        p_idx = pool.add_string("[")
        compiled = CompiledFilter(pool, [
            Instruction(Opcode.PUSH_FIELD, f_idx),
            Instruction(Opcode.PUSH_CONST, p_idx),
            Instruction(Opcode.MATCHES),
            Instruction(Opcode.HALT),
        ])
        assert FilterVM().execute(compiled, fields(x="anything")) is False

    def test_null_checks(self):
        assert run("d IS NULL", d=None)
        assert run("d IS NULL", d="")          # empty string counts as null
        assert not run("d IS NULL", d="text")
        assert run("d IS NOT NULL", d="text")

    def test_missing_field_is_null(self):
        assert run("missing IS NULL", other="x")
        assert not run("missing = 'x'", other="x")

    def test_short_circuit_and_or(self):
        assert run("a = '1' AND b = '2'", a="1", b="2")
        assert not run("a = '1' AND b = '2'", a="0", b="2")
        assert run("a = '1' OR b = '2'", a="0", b="2")
        assert not run("a = '1' OR b = '2'", a="0", b="0")

    def test_not(self):
        assert run("NOT a = '1'", a="2")

    def test_ternary(self):
        expr = "genre = 'kids' ? rating <= 7 : rating <= 18"
        assert run(expr, genre="kids", rating=5)
        assert not run(expr, genre="kids", rating=10)
        assert run(expr, genre="adult", rating=10)
        assert not run(expr, genre="adult", rating=20)

    def test_nested_composites(self):
        expr = "(a = '1' || b = '2') && !(c = '3')"
        assert run(expr, a="1", c="0")
        assert not run(expr, a="1", c="3")


class TestBytecode:
    def test_halt_appended(self):
        compiled = FilterCompiler().compile(Filter.parse("a = '1'"))
        assert compiled.instructions[-1].opcode == Opcode.HALT

    def test_constant_dedup(self):
        compiled = FilterCompiler().compile(Filter.parse("a = 'x' OR a = 'x'"))
        assert compiled.constants.count == 2  # "a" and "x" deduped

    def test_serialize_roundtrip(self):
        for expr in ["a = '1'",
                     "a = '1' AND (b > 2 OR c IN ('x','y'))",
                     "t CONTAINS 'q' ? a IS NULL : b LIKE '%z%'",
                     "year BETWEEN 1990 AND 2000"]:
            compiled = FilterCompiler().compile(Filter.parse(expr))
            data = serialize(compiled)
            assert is_valid_bytecode(data)
            restored = deserialize(data)
            assert len(restored.instructions) == len(compiled.instructions)
            for a, b in zip(restored.instructions, compiled.instructions):
                assert a.opcode == b.opcode and a.operand1 == b.operand1
            # Behavioral equivalence
            doc = fields(a="1", b="5", c="x", t="quux", year=1995)
            assert FilterVM().execute(restored, doc) == \
                FilterVM().execute(compiled, doc)

    def test_bad_magic_rejected(self):
        with pytest.raises(ValueError):
            deserialize(b"NOTINFISCRIPT-XXXX")

    def test_disassemble(self):
        compiled = FilterCompiler().compile(Filter.parse("a = '1'"))
        text = compiled.disassemble()
        assert "PUSH_FIELD" in text and "HALT" in text


class TestFilterBuilder:
    def test_fluent(self):
        f = FilterBuilder.where("genre", "Fantasy").and_("year", "2000").build()
        assert isinstance(f, CompositeFilter)
        compiled = FilterCompiler().compile(f)
        assert FilterVM().execute(compiled, fields(genre="Fantasy", year="2000"))

    def test_not(self):
        f = FilterBuilder.where("a", "1").not_().build()
        compiled = FilterCompiler().compile(f)
        assert FilterVM().execute(compiled, fields(a="2"))
