"""Property-based tests (hypothesis) for the Lara schema calculus —
union/join key rules hold for arbitrary schemas (SURVEY.md §5 strategy:
the reference has none; we add them)."""

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from laradb_spark.schema import Attribute, LaraSchema, ValAttribute

names = st.text(alphabet=string.ascii_lowercase, min_size=1, max_size=6)
types = st.sampled_from(["LONG", "STRING", "DOUBLE"])


@st.composite
def schemas(draw):
    key_names = draw(st.lists(names, min_size=1, max_size=4, unique=True))
    n_vals = draw(st.integers(0, 3))
    val_names = draw(
        st.lists(
            names.filter(lambda n: n not in key_names),
            min_size=n_vals,
            max_size=n_vals,
            unique=True,
        )
    )
    keys = tuple(Attribute(n, draw(types)) for n in key_names)
    vals = tuple(ValAttribute(n, "DOUBLE", 0.0) for n in val_names)
    return LaraSchema(keys, vals)


@st.composite
def prefix_pairs(draw):
    """Two schemas sharing exactly a common key prefix."""
    shared = draw(st.lists(names, min_size=0, max_size=3, unique=True))
    rest_pool = names.filter(lambda n: n not in shared)
    extra_a = draw(st.lists(rest_pool, min_size=0, max_size=2, unique=True))
    extra_b = draw(
        st.lists(
            rest_pool.filter(lambda n: n not in extra_a), min_size=0, max_size=2, unique=True
        )
    )
    # fallback names contain a digit, which the `names` alphabet (pure
    # lowercase) cannot draw — so they can never collide with a drawn
    # extra_b/extra_a. (The old "ka"/"kb" fallbacks COULD be drawn into
    # extra_b, because extra_b's not-in-extra_a filter ran before the
    # fallback assignment: hypothesis eventually found A=[ka], B=[a, ka],
    # which shares 'ka' not-as-a-prefix and correctly trips the join's
    # prefix check — a generator bug, not a schema bug.)
    if not shared and not extra_a:
        extra_a = ["ka0"]
    if not shared and not extra_b:
        extra_b = ["kb0"]
    ka = tuple(Attribute(n, "LONG") for n in shared + extra_a)
    kb = tuple(Attribute(n, "LONG") for n in shared + extra_b)
    return LaraSchema(ka, ()), LaraSchema(kb, ()), shared


@settings(max_examples=200, deadline=None)
@given(prefix_pairs())
def test_common_prefix_is_shared_set(pair):
    a, b, shared = pair
    prefix = a.common_key_prefix(b)
    assert [p.name for p in prefix] == shared


@settings(max_examples=200, deadline=None)
@given(prefix_pairs())
def test_join_key_union_order_and_completeness(pair):
    a, b, shared = pair
    keys = a.union_keys_prefix(b)
    knames = [k.name for k in keys]
    # no duplicates; contains every key of both; self keys keep order
    assert len(set(knames)) == len(knames)
    assert set(knames) == set(a.key_names) | set(b.key_names)
    assert knames[: len(a.keys)] == a.key_names


@settings(max_examples=200, deadline=None)
@given(schemas(), schemas())
def test_union_vals_idempotent_and_symmetric_sets(s1, s2):
    try:
        v12 = {v.name for v in s1.union_vals(s2)}
        v21 = {v.name for v in s2.union_vals(s1)}
    except ValueError:
        return  # conflicting same-name attrs — correctly rejected
    assert v12 == v21 == set(s1.val_names) | set(s2.val_names)


@settings(max_examples=200, deadline=None)
@given(schemas())
def test_schema_roundtrip_struct(s):
    struct = s.to_struct()
    assert [f.name for f in struct.fields] == s.names
