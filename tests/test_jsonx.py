"""JSON extraction: regex fast path == json.loads path on flat docs;
loads path handles the messy shapes the fast path excludes."""

import pyarrow as pa

from deduplicate_ray.functions import jsonx

FLAT = ['{"k": 69}', '{"k": -3, "m": 1}', '{"m": 2}', '{"k": 0}', '',
        '{ "k" :  12 }', '{"a": 5, "k": 99}', 'not json', None]


def _vals(docs, **kw):
    t = pa.table({"props": pa.array(docs, pa.string())})
    return jsonx.extract_int_field(t, "props", "k", **kw).column("k") \
        .to_pylist()


def test_fast_path_matches_loads_on_flat_docs():
    assert _vals(FLAT, assume_flat=True) == _vals(FLAT, assume_flat=False)
    assert _vals(FLAT, assume_flat=True) == \
        [69, -3, None, 0, None, 12, 99, None, None]


def test_loads_path_on_nested_and_escaped():
    messy = ['{"outer": {"k": 1}, "k": 7}',      # top-level k wins
             '{"s": "\\"k\\": 5", "k": 8}',      # key text inside string
             '{"k": 2.5}',                        # non-int → null
             '{"k": true}',                       # bool is not an int
             '[1, 2, 3]']
    assert _vals(messy, assume_flat=False) == [7, 8, None, None, None]


def test_fast_path_rejects_floats_and_exponents():
    docs = ['{"k": 2.5}', '{"k": 1e3}', '{"k": -0.75}', '{"k": 3}']
    assert _vals(docs, assume_flat=True) == [None, None, None, 3]
    assert _vals(docs, assume_flat=True) == _vals(docs, assume_flat=False)


def test_fast_path_last_occurrence_matches_loads_dup_keys():
    # duplicate keys: json.loads keeps the LAST value; the greedy-prefix
    # fast path anchors to the last occurrence too. A key-shaped substring
    # in an EARLIER string value is also skipped when a real key follows.
    docs = ['{"k": 1, "k": 2}', '{"s": "\\"k\\": 5", "k": 8}',
            '{"k": 4, "k": 2.5}']
    assert _vals(docs, assume_flat=True) == [2, 8, None]
    assert _vals(docs, assume_flat=True) == _vals(docs, assume_flat=False)


def test_field_name_metachars_are_escaped():
    t = pa.table({"props": pa.array(['{"aXb": 7}', '{"a.b": 9}'],
                                    pa.string())})
    got = jsonx.extract_int_field(t, "props", "a.b").column("a.b") \
        .to_pylist()
    assert got == [None, 9]
