"""API.md must match the code — regenerating it is part of adding an
operator (tools/gen_api_index.py)."""

import os


def test_api_index_is_fresh():
    import tools.gen_api_index as gen

    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "API.md")
    with open(path) as f:
        on_disk = f.read()
    assert on_disk == gen.render(), (
        "API.md is stale — run `python tools/gen_api_index.py`"
    )
