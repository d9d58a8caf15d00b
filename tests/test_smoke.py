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
