"""RFC 8785 JCS canonicalizer tests (reference: rdf/jsoncanonicalizer.go).
Vectors adapted from the RFC's published examples."""

import pytest

from rdf_go_spark.functions.jcs import JcsError, canonicalize_json


class TestJcs:
    def test_key_sorting_and_whitespace(self):
        assert canonicalize_json('{"b": 2, "a": 1}') == '{"a":1,"b":2}'

    def test_nested(self):
        assert canonicalize_json('{"z":{"y":[1, 2 ,3],"x":"s"}}') == \
            '{"z":{"x":"s","y":[1,2,3]}}'

    def test_literals(self):
        assert canonicalize_json('[true, false, null]') == "[true,false,null]"

    def test_string_escapes(self):
        assert canonicalize_json('"a\\u0041\\n\\u0008"') == '"aA\\n\\b"'
        assert canonicalize_json('"\\u000b"') == '"\\u000b"'

    def test_integral_numbers(self):
        assert canonicalize_json("[1, 1.0, 1e2, 10.0]") == "[1,1,100,10]"
        assert canonicalize_json("[-0.0, 0]") == "[0,0]"

    def test_fractional_numbers(self):
        assert canonicalize_json("[0.5, 3.141592653589793]") == \
            "[0.5,3.141592653589793]"

    def test_rfc_sorting_example(self):
        # RFC 8785 §3.2.3: UTF-16 code-unit ordering
        src = ('{"\\u20ac":"Euro","\\"":"quote","a":"a","A":"A",'
               '"\\u00e9":"e-acute"}')
        out = canonicalize_json(src)
        keys = ['"\\""', '"A"', '"a"', '"é"', '"€"']
        pos = [out.index(k) for k in keys]
        assert pos == sorted(pos)

    def test_idempotent(self):
        src = '{"b":[2.5,{"d":null,"c":"x"}],"a":true}'
        once = canonicalize_json(src)
        assert canonicalize_json(once) == once

    def test_errors(self):
        with pytest.raises(JcsError):
            canonicalize_json("not json")
        with pytest.raises(JcsError):
            canonicalize_json(str(1 << 60))
