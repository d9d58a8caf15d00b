"""End-to-end smoke: the M1 slice — CREATE, MATCH with props/$params, RETURN."""


def test_create_and_match_node(session):
    out = session.execute('CREATE (n:Person {name:"Neo"})')
    assert out.mutated
    res = session.execute('MATCH (p:Person {name:"Neo"}) RETURN p')
    assert len(res.rows) == 1
    row = res.rows[0]
    assert row.is_node
    assert row.label == "Person"
    assert row.properties == {"name": "Neo"}


def test_match_with_param(session):
    session.execute('CREATE (n:Person {name:"Trinity"})')
    res = session.execute("MATCH (p:Person {name:$name}) RETURN p", {"name": "Trinity"})
    assert len(res.rows) == 1
    assert res.rows[0].properties["name"] == "Trinity"


def test_return_prop(session):
    session.execute('CREATE (m:Movie {title:"The Matrix", released:"1999"})')
    res = session.execute("MATCH (m:Movie) RETURN m.title")
    assert [r.info for r in res.rows] == ["The Matrix"]


def test_one_hop_path(session):
    session.execute(
        'CREATE (p:Person {name:"Keanu"}); '
        'CREATE (m:Movie {title:"John Wick"}); '
        'MATCH (p:Person {name:"Keanu"}), (m:Movie {title:"John Wick"}) '
        'CREATE (p)-[r:ACTED_IN {role:"John"}]->(m)'
    )
    res = session.execute("MATCH (a:Person)-[r:ACTED_IN]->(b:Movie) RETURN b")
    assert len(res.rows) == 1
    assert res.rows[0].properties["title"] == "John Wick"
    res2 = session.execute('MATCH (a)-[r:ACTED_IN {role:"John"}]-(b) RETURN b')
    # undirected: both orientations bind
    assert len(res2.rows) == 2


def test_entry_registry_oracle_consistency():
    # every oracle key must name a registered query (an orphan oracle
    # silently never runs in any harness), and the rows-only set must
    # stay exactly the two documented SQL-inexpressible queries
    # (docs_bpe_train joined the hash-checked set in r9)
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "entry_consistency",
        os.path.join(os.path.dirname(__file__), "..", "__spark_entry__.py"),
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    q, o = m.queries(), m.oracle_sql()
    assert set(o) <= set(q)
    assert set(q) - set(o) == {"docs_compression", "emb_pca"}
    # reset_memo must accept every registered name without KeyError
    for name in q:
        m.reset_memo(name)
