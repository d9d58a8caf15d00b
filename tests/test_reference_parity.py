"""Port of the reference's 20 integration tests (tests/unittests.rs:23-633)
to pytest against the Spark engine — same queries, same literal asserts.

Each test cites the reference test it ports. Where the reference asserts
on Rust API details that have no analogue (e.g. boolean returns of
metadata mutators), the assert is on the equivalent observable state and
the divergence is noted inline.
"""

from __future__ import annotations

import pytest

from graph_loom_spark.cypher.ast import CypherError
from graph_loom_spark.graph import GraphConsistencyError, PropertyGraph
from graph_loom_spark.ids import uuid7_batch


def _ids(rows):
    """ids_from_rows (unittests.rs:11-21): node/rel ids, Info skipped."""
    return [r.id for r in rows if not r.is_info]


def _infos(rows):
    return [r.info for r in rows if r.is_info]


# ---------------------------------------------------------------------------
# cypher_params_in_pattern_and_where (unittests.rs:23-59)
# ---------------------------------------------------------------------------
def test_cypher_params_in_pattern_and_where(session):
    session.execute("CREATE (:Person {name: 'Neo'});")
    session.execute("CREATE (:Movie {title: 'The Matrix', released: 1999});")
    session.execute("CREATE (:Movie {title: 'The Matrix Reloaded', released: 2003});")

    out = session.execute("MATCH (p:Person {name: $name}) RETURN p", {"name": "Neo"})
    assert len(out.rows) == 1
    assert out.rows[0].is_node
    assert out.rows[0].label == "Person"
    assert out.rows[0].properties.get("name") == "Neo"

    q = """
        MATCH (m:Movie)
        WHERE m.released > $year AND m.title CONTAINS $substr
        RETURN m.title
    """
    out = session.execute(q, {"year": "2000", "substr": "Matrix"})
    assert len(out.rows) == 1
    assert out.rows[0].info == "The Matrix Reloaded"


# ---------------------------------------------------------------------------
# cypher_match_dot_label_and_where_property (unittests.rs:61-78)
# ---------------------------------------------------------------------------
def test_cypher_match_dot_label_and_where_property(session):
    session.execute("CREATE (:Keyword {keyword: 'theory'})")
    session.execute("CREATE (:Keyword {keyword: 'practice'})")
    out = session.execute('MATCH (n.Keyword)\nWHERE n.keyword = "theory"\nRETURN n')
    assert len(_ids(out.rows)) == 1


# ---------------------------------------------------------------------------
# graphdb_add_node_relationship_and_cascade_delete (unittests.rs:80-93)
# ---------------------------------------------------------------------------
def test_graphdb_add_node_relationship_and_cascade_delete(spark):
    g = PropertyGraph.empty(spark)
    a, b = g.add_nodes([("Person", {}), ("Company", {})])
    (rid,) = g.add_edges([(a, b, "WORKS_AT", {})])
    assert g.edges.filter(g.edges.id == rid).count() == 1
    removed_nodes, removed_edges = g.delete_nodes_by_ids(
        spark.createDataFrame([(a,)], "id string"), detach=True
    )
    assert removed_nodes == 1
    # relationship removed too (cascade, graph.rs:145-162)
    assert g.edges.filter(g.edges.id == rid).count() == 0


# ---------------------------------------------------------------------------
# graphdb_metadata_upsert_and_remove (unittests.rs:95-105)
# ---------------------------------------------------------------------------
def test_graphdb_metadata_upsert_and_remove(spark):
    g = PropertyGraph.empty(spark)
    (n,) = g.add_nodes([("Person", {})])
    ids = spark.createDataFrame([(n,)], "id string")
    assert g.upsert_property("node", ids, "name", "Ada") == 1
    assert g.upsert_property("node", ids, "role", "Engineer") == 1
    assert g.remove_property("node", ids, "role") == 1
    # divergence note: the reference's remove returns false when the key
    # is already gone; we assert the observable state instead.
    props = g.nodes.filter(g.nodes.id == n).collect()[0]["properties"]
    assert props == {"name": "Ada"}


# ---------------------------------------------------------------------------
# graphdb_add_relationship_missing_endpoints_fails (unittests.rs:107-115)
# ---------------------------------------------------------------------------
def test_graphdb_add_relationship_missing_endpoints_fails(spark):
    g = PropertyGraph.empty(spark)
    u1, u2 = uuid7_batch(2)
    with pytest.raises(GraphConsistencyError):
        g.add_edges([(u1, u2, "KNOWS", {})])


# ---------------------------------------------------------------------------
# gql_create_match_where_delete_node_flow (unittests.rs:117-160)
# ---------------------------------------------------------------------------
def test_gql_create_match_where_delete_node_flow(session):
    out = session.execute(
        'CREATE NODE Person {name:"Ada", role:"Engineer"};'
        'CREATE NODE Person {name:"Bob", role:"Designer"};'
    )
    assert out.mutated
    assert out.affected_nodes == 2
    ada_id, bob_id = _ids(out.rows)

    m1 = session.execute("MATCH NODE Person;")
    assert len(m1.rows) == 2

    m2 = session.execute('MATCH NODE Person {role:"Engineer"};')
    assert len(m2.rows) == 1

    m3 = session.execute(
        f'MATCH NODE Person WHERE id={ada_id} AND HAS(name) AND name="Ada" AND role!="Manager";'
    )
    assert len(m3.rows) == 1

    d = session.execute(f"DELETE NODE {bob_id};")
    assert d.affected_nodes == 1

    m4 = session.execute("MATCH NODE Person;")
    assert len(m4.rows) == 1


# ---------------------------------------------------------------------------
# gql_create_rel_match_where_delete_flow (unittests.rs:162-208)
# ---------------------------------------------------------------------------
def test_gql_create_rel_match_where_delete_flow(session):
    out = session.execute(
        'CREATE NODE Person {name:"Ada"};CREATE NODE Company {name:"Acme"};'
    )
    ada, acme = _ids(out.rows)

    c = session.execute(
        f'CREATE REL from={ada} to={acme} label=WORKS_AT {{since:"2021"}};'
    )
    assert c.affected_relationships == 1

    mr = session.execute("MATCH REL WORKS_AT;")
    assert len(mr.rows) == 1

    w = session.execute(f"MATCH REL WORKS_AT WHERE from={ada} AND to={acme};")
    assert len(w.rows) == 1

    rel_id = mr.rows[0].id
    dr = session.execute(f"DELETE REL {rel_id};")
    assert dr.affected_relationships == 1


# ---------------------------------------------------------------------------
# gql_errors_and_edge_cases (unittests.rs:210-227)
# ---------------------------------------------------------------------------
def test_gql_errors_and_edge_cases(session):
    with pytest.raises(CypherError):
        session.execute('UPDATE NODE Person SET name="X";')
    with pytest.raises(CypherError):
        session.execute("MATCH NODE Person WHERE id=not-a-uuid;")
    u1, u2 = uuid7_batch(2)
    with pytest.raises((CypherError, GraphConsistencyError)):
        session.execute(f"CREATE REL from={u1} to={u2} label=LIKES;")


# ---------------------------------------------------------------------------
# gql_multi_statement_execution_aggregates_counts (unittests.rs:229-246)
# ---------------------------------------------------------------------------
def test_gql_multi_statement_execution_aggregates_counts(session):
    out = session.execute(
        'CREATE NODE A {k:"v"};CREATE NODE B {x:"y"};CREATE NODE B {x:"z"};'
    )
    assert out.mutated
    assert out.affected_nodes == 3
    m = session.execute('MATCH NODE B {x:"y"};')
    assert len(m.rows) == 1


# ---------------------------------------------------------------------------
# cypher_match_merge_pairwise_creation (unittests.rs:248-274)
# ---------------------------------------------------------------------------
def test_cypher_match_merge_pairwise_creation(session):
    session.execute(
        'CREATE NODE asdf {name:"n1"};CREATE NODE asdf {name:"n2"};CREATE NODE asdf {name:"n3"};'
    )
    assert session.graph.nodes.count() == 3

    q = "MATCH (a:asdf), (b:asdf) WHERE id(a) < id(b) MERGE (a)-[:RELATED_TO]->(b);"
    r1 = session.execute(q)
    assert r1.affected_relationships == 3
    assert session.graph.edges.count() == 3

    r2 = session.execute(q)  # idempotent re-run
    assert r2.affected_relationships == 0
    assert session.graph.edges.count() == 3


# ---------------------------------------------------------------------------
# cypher_delete_relationships_by_label (unittests.rs:276-304)
# ---------------------------------------------------------------------------
def test_cypher_delete_relationships_by_label(session):
    session.execute(
        'CREATE NODE asdf {name:"n1"};CREATE NODE asdf {name:"n2"};CREATE NODE asdf {name:"n3"};'
    )
    session.execute(
        "MATCH (a:asdf), (b:asdf) WHERE id(a) < id(b) MERGE (a)-[:RELATED_TO]->(b);"
    )
    assert session.graph.edges.count() == 3

    del_q = "MATCH (a:asdf)-[r:RELATED_TO]-(b:asdf) DELETE r;"
    session.execute(del_q)
    assert session.graph.edges.count() == 0
    session.execute(del_q)  # idempotent second delete
    assert session.graph.edges.count() == 0


# ---------------------------------------------------------------------------
# cypher_match_node_with_props_and_return (unittests.rs:306-320)
# ---------------------------------------------------------------------------
def test_cypher_match_node_with_props_and_return(session):
    session.execute("CREATE (:Person {name: 'Keanu Reeves'});")
    out = session.execute("MATCH (p:Person {name: 'Keanu Reeves'}) RETURN p;")
    assert len(out.rows) == 1
    assert out.rows[0].is_node
    assert out.rows[0].label == "Person"
    assert out.rows[0].properties.get("name") == "Keanu Reeves"


# ---------------------------------------------------------------------------
# cypher_match_rel_with_props_and_return_property (unittests.rs:322-340)
# ---------------------------------------------------------------------------
def test_cypher_match_rel_with_props_and_return_property(session):
    session.execute("CREATE (:Person {name: 'Tom Hanks'});")
    session.execute("CREATE (:Movie {title: 'Forrest Gump'});")
    session.execute(
        "MATCH (p:Person {name: 'Tom Hanks'}), (m:Movie {title: 'Forrest Gump'})\n"
        "CREATE (p)-[:ACTED_IN {role: 'Forrest Gump'}]->(m);"
    )
    out = session.execute(
        "MATCH (:Person {name: 'Tom Hanks'})-[r:ACTED_IN {role: 'Forrest Gump'}]->(m:Movie)\n"
        "RETURN m.title"
    )
    assert len(out.rows) == 1
    assert out.rows[0].info == "Forrest Gump"


# ---------------------------------------------------------------------------
# cypher_where_contains_and_numeric_compare (unittests.rs:342-359)
# ---------------------------------------------------------------------------
def test_cypher_where_contains_and_numeric_compare(session):
    session.execute("CREATE (:Movie {title: 'The Matrix', released: 1999});")
    session.execute("CREATE (:Movie {title: 'The Matrix Reloaded', released: 2003});")
    session.execute("CREATE (:Movie {title: 'John Wick', released: 2014});")
    out = session.execute(
        "MATCH (m:Movie)\nWHERE m.released > 2000 AND m.title CONTAINS 'Matrix'\nRETURN m.title"
    )
    assert _infos(out.rows) == ["The Matrix Reloaded"]


# ---------------------------------------------------------------------------
# cypher_where_multiple_equals_clauses (unittests.rs:361-382)
# ---------------------------------------------------------------------------
def test_cypher_where_multiple_equals_clauses(session):
    session.execute("CREATE (:Person {name: 'Tom Hanks', born: 1956});")
    session.execute("CREATE (:Person {name: 'Tom Hardy', born: 1977});")
    out = session.execute(
        "MATCH (p:Person)\nWHERE p.name = 'Tom Hanks' AND p.born = 1956\nRETURN p"
    )
    assert len(out.rows) == 1
    row = out.rows[0]
    assert row.label == "Person"
    assert row.properties.get("name") == "Tom Hanks"
    # bare number stored as string (graph.rs:7-8, unittests.rs:378)
    assert row.properties.get("born") == "1956"


# ---------------------------------------------------------------------------
# cypher_variable_length_path_basic (unittests.rs:384-425)
# ---------------------------------------------------------------------------
def test_cypher_variable_length_path_basic(session):
    session.execute("CREATE (:X {name:'X1'});CREATE (:X {name:'X2'});CREATE (:X {name:'X3'});")
    all_rows = session.execute("MATCH (n:X) RETURN n;")
    ids = sorted(_ids(all_rows.rows))
    assert len(ids) == 3
    a, b, c = ids
    session.execute(f"CREATE REL from={a} to={b} label=R;")
    session.execute(f"CREATE REL from={b} to={c} label=R;")

    out = session.execute("MATCH (s:X)-[:R*2]->(t:X)\nRETURN t")
    assert len(out.rows) == 1
    assert out.rows[0].label == "X"
    assert out.rows[0].id == c


# ---------------------------------------------------------------------------
# cypher_return_distinct_and_order_limit (unittests.rs:427-451)
# ---------------------------------------------------------------------------
def test_cypher_return_distinct_and_order_limit(session):
    session.execute("CREATE (:Movie {title: 'The Matrix'});")
    session.execute("CREATE (:Movie {title: 'The Matrix'});")
    session.execute("CREATE (:Movie {title: 'John Wick'});")
    session.execute("CREATE (:Movie {title: 'Speed'});")
    out = session.execute(
        "MATCH (m:Movie)\nRETURN DISTINCT m.title ORDER BY m.title ASC LIMIT 2"
    )
    assert _infos(out.rows) == ["John Wick", "Speed"]


# ---------------------------------------------------------------------------
# cypher_set_remove_properties_and_labels (unittests.rs:453-494)
# ---------------------------------------------------------------------------
def test_cypher_set_remove_properties_and_labels(session):
    session.execute("CREATE (:Person {name: 'Neo'});")
    out = session.execute(
        "MATCH (p:Person {name:'Neo'})\nSET p.role = 'The One', p:Hero\nRETURN p"
    )
    assert len(out.rows) == 1
    row = out.rows[0]
    assert row.label == "Hero"  # SET :Label REPLACES the label (graph.rs:68-75)
    assert row.properties.get("name") == "Neo"
    assert row.properties.get("role") == "The One"
    nid = row.id

    out2 = session.execute(
        "MATCH (p:Hero)\nWHERE id(p) = id(p)\nREMOVE p.role\nRETURN p"
    )
    assert len(out2.rows) == 1
    row2 = out2.rows[0]
    assert row2.id == nid
    assert row2.label == "Hero"
    assert "role" not in (row2.properties or {})


# ---------------------------------------------------------------------------
# cypher_multiline_match_delete (unittests.rs:496-520)
# ---------------------------------------------------------------------------
def test_cypher_multiline_match_delete(session):
    session.execute('CREATE NODE asdf {name:"n1"};CREATE NODE asdf {name:"n2"};')
    session.execute(
        "MATCH (a:asdf), (b:asdf) WHERE id(a) < id(b) MERGE (a)-[:RELATED_TO]->(b);"
    )
    assert session.graph.edges.count() == 1
    session.execute("\n        MATCH (a:asdf)-[r:RELATED_TO]-(b:asdf)\n        DELETE r;\n    ")
    assert session.graph.edges.count() == 0


# ---------------------------------------------------------------------------
# cypher_multiline_match_where_merge (unittests.rs:522-546)
# ---------------------------------------------------------------------------
def test_cypher_multiline_match_where_merge(session):
    session.execute(
        'CREATE NODE asdf {name:"n1"};CREATE NODE asdf {name:"n2"};CREATE NODE asdf {name:"n3"};'
    )
    assert session.graph.nodes.count() == 3
    r = session.execute(
        "\n        MATCH (a:asdf), (b:asdf)\n        WHERE id(a) < id(b)\n"
        "        MERGE (a)-[:RELATED_TO]->(b);\n    "
    )
    assert r.mutated
    assert session.graph.edges.count() == 3


# ---------------------------------------------------------------------------
# cypher_match_where_create_relationships (unittests.rs:548-572)
# ---------------------------------------------------------------------------
def test_cypher_match_where_create_relationships(session):
    session.execute(
        'CREATE NODE Text {name:"t1"};CREATE NODE Text {name:"t2"};CREATE NODE Text {name:"t3"};'
    )
    assert session.graph.nodes.count() == 3
    session.execute(
        "\n        MATCH (a:Text), (b:Text)\n        WHERE id(a) < id(b)\n"
        "        CREATE (a)-[:IS_IN]->(b);\n    "
    )
    assert session.graph.edges.count() == 3


# ---------------------------------------------------------------------------
# cypher_multiline_match_detach_delete_nodes (unittests.rs:574-604)
# ---------------------------------------------------------------------------
def test_cypher_multiline_match_detach_delete_nodes(session):
    session.execute('CREATE NODE Person {name:"Ada"};CREATE NODE Person {name:"Bob"};')
    session.execute(
        "\n        MATCH (a:Person), (b:Person)\n        WHERE id(a) < id(b)\n"
        "        MERGE (a)-[:RELATED_TO]->(b);\n    "
    )
    assert session.graph.nodes.count() == 2
    assert session.graph.edges.count() == 1
    session.execute("\n        MATCH (n:Person)\n        DETACH DELETE n\n    ")
    assert session.graph.nodes.count() == 0
    assert session.graph.edges.count() == 0


# ---------------------------------------------------------------------------
# cypher_multiline_create_comma_delimited (unittests.rs:606-633)
# ---------------------------------------------------------------------------
def test_cypher_multiline_create_comma_delimited(session):
    q = """
    CREATE
      (t1:T1 {name:'T1'}),
      (t2:T2 {name:'T2'}),
      (t3:T3 {name:'T3'}),
      (t4:T4 {name:'T4'}),
      (t5:T5 {name:'T5'}),
      (t6:T6 {name:'T6'}),
      (t7:T7 {name:'T7'}),
      (t8:T8 {name:'T8'}),
      (t9:T9 {name:'T9'}),
      (t10:T10 {name:'T10'}),
    """
    out = session.execute(q)
    assert out.mutated
    assert session.graph.nodes.count() == 10
    labels = {r["label"] for r in session.graph.nodes.select("label").collect()}
    assert "T1" in labels
    assert "T10" in labels


# ---------------------------------------------------------------------------
# Error-message parity: clients of the reference see these exact strings
# (serve layer returns them verbatim in 400 bodies / gRPC error field)
# ---------------------------------------------------------------------------
def _err(session, query, params=None):
    with pytest.raises((CypherError, GraphConsistencyError)) as ei:
        session.execute(query, params)
    return str(ei.value)


def test_error_strings_match_reference(session):
    # query_interface.rs:132 — unrecognized statement echoes the statement
    assert _err(session, 'UPDATE NODE Person SET name="X";').startswith(
        "unrecognized statement:"
    )
    # query_interface.rs:662 — bad uuid (suffix is the parser's detail text)
    assert _err(session, "MATCH NODE Person WHERE id=not-a-uuid;").startswith(
        "invalid uuid:"
    )
    # query_interface.rs:564 — CREATE REL with endpoints not in the graph
    u1, u2 = uuid7_batch(2)
    assert (
        _err(session, f"CREATE REL from={u1} to={u2} label=LIKES;")
        == "invalid endpoint(s) for relationship"
    )
    # query_interface.rs:560-562 — missing CREATE REL parts
    assert _err(session, f"CREATE REL to={u2} label=LIKES;") == "missing from uuid"
    assert _err(session, f"CREATE REL from={u1} label=LIKES;") == "missing to uuid"
    assert _err(session, f"CREATE REL from={u1} to={u2};") == "missing label"
    # query_interface.rs:303,313,349 — legacy WHERE diagnostics
    assert _err(session, "MATCH NODE Person WHERE HAS();") == "WHERE has() requires a key"
    assert (
        _err(session, 'MATCH NODE Person WHERE id!="x";')
        == "'!=' supported only for metadata keys"
    )
    assert _err(session, "MATCH NODE Person WHERE ???;").startswith(
        "unrecognized WHERE condition:"
    )
    # query_interface.rs:80 — empty input
    assert _err(session, "   ") == "empty query"
    # query_interface.rs:386 — MATCH..MERGE routes to the legacy pairwise
    # handler, which demands two comma patterns (same in the reference)
    session.execute("CREATE (:Person {name:'A'})")
    assert (
        _err(session, "MATCH (p:Person) MERGE (q:Person {name:'B'})")
        == "missing second pattern"
    )
    # cypher_spec.rs:1385-1387 — Cypher MERGE restricted to rel patterns
    assert (
        _err(session, "MERGE (q:Person {name:'B'})")
        == "MERGE currently supports only single relationship patterns"
    )


def test_delete_with_rels_error_names_offending_node(session):
    session.execute(
        "CREATE (a:P {name:'x'});CREATE (b:P {name:'y'});"
        "MATCH (a:P),(b:P) WHERE id(a) < id(b) MERGE (a)-[:R]->(b)"
    )
    msg = _err(session, "MATCH (n:P) DELETE n")
    # cypher_spec.rs:1237 — names the node; ours reports the smallest id
    assert msg.startswith("Cannot DELETE node ")
    assert msg.endswith(" with existing relationships; use DETACH DELETE")
    named = msg[len("Cannot DELETE node ") : -len(" with existing relationships; use DETACH DELETE")]
    ids = sorted(r["id"] for r in session.graph.nodes.select("id").collect())
    assert named == ids[0]
