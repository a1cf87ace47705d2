"""Raco importer tests: parse → compile → execute the reference's netflow
plan shape (reference: opt/QueryOptimizeExecuteTest.kt:92-119 worked
example; parser reference: opt/raco/PTree.kt, opt/raco/RacoConvertTest.kt)."""

import os

import pytest

from laradb_spark.plans import parse_raco
from laradb_spark.plans.raco import Node, RacoCompiler

NETFLOW_HEADER = "StartTime,Dur,Proto,SrcAddr,Sport,Dir,DstAddr,Dport,State,sTos,dTos,TotPkts,TotBytes,SrcBytes,Label"
NETFLOW_ROWS = [
    "2011/08/10 09:46:53.047277,3550.182373,udp,212.50.71.179,39678,  <->,147.32.84.229,13363,CON,0,0,12,875,413,flow=Background-UDP",
    "2011/08/10 09:46:53.048843,0.000883,udp,84.13.246.132,28431,  <->,147.32.84.229,13363,CON,0,0,2,135,75,flow=Background-UDP",
    "2011/08/10 09:46:53.049895,0.000326,tcp,217.163.21.35,80,  <?>,147.32.86.194,2063,FA_A,0,0,2,90,45,flow=Background",
]

SCHEME = (
    "Scheme([('StartTime', 'STRING_TYPE'), ('Dur', 'DOUBLE_TYPE'), ('Proto', 'STRING_TYPE'), "
    "('SrcAddr', 'STRING_TYPE'), ('Sport', 'STRING_TYPE'), ('Dir', 'STRING_TYPE'), "
    "('DstAddr', 'STRING_TYPE'), ('Dport', 'STRING_TYPE'), ('State', 'STRING_TYPE'), "
    "('sTos', 'LONG_TYPE'), ('dTos', 'LONG_TYPE'), ('TotPkts', 'LONG_TYPE'), "
    "('TotBytes', 'LONG_TYPE'), ('SrcBytes', 'LONG_TYPE'), ('Label', 'STRING_TYPE')])"
)


@pytest.fixture(scope="module")
def netflow_csv(tmp_path_factory):
    d = tmp_path_factory.mktemp("raco")
    p = os.path.join(str(d), "netflow.csv")
    with open(p, "w") as f:
        f.write(NETFLOW_HEADER + "\n" + "\n".join(NETFLOW_ROWS) + "\n")
    return p


def test_parse_repr_structures():
    t = parse_raco("Store(RelationKey('public','adhoc','out'), Dump(Scan(RelationKey('a','b','c'), Scheme([('x', 'LONG_TYPE')]), 10000, RepresentationProperties(frozenset([]), None, None))))")
    assert isinstance(t, Node) and t.name == "Store"
    assert t.args[0].name == "RelationKey" and t.args[0].args == ["public", "adhoc", "out"]
    scan = t.args[1].args[0]
    assert scan.name == "Scan"
    assert scan.args[1].args[0] == [("x", "LONG_TYPE")]
    assert parse_raco("{'skip': 1}") == {"skip": 1}
    assert parse_raco("NumericLiteral(1000.0)").args == [1000.0]
    assert parse_raco("[('a', NamedAttributeRef('b'))]")[0][0] == "a"


def test_netflow_plan_end_to_end(spark, netflow_csv):
    """The reference's worked two-step example: FileScan → Select(GT on
    TotBytes) → Apply(cols + computed RATE) → result."""
    plan = f"""
    Dump(Apply([
        ('src_ip', NamedAttributeRef('SrcAddr')),
        ('dst_ip', NamedAttributeRef('DstAddr')),
        ('RATE', DIVIDE(DIVIDE(NamedAttributeRef('TotBytes'), NamedAttributeRef('Dur')), NumericLiteral(1000.0))),
        ('value', NumericLiteral(1.0))
      ],
      Select(GT(UnnamedAttributeRef(12, None), NumericLiteral(100)),
        FileScan('file://{netflow_csv}', 'CSV', {SCHEME}, {{'skip': 1}}))))
    """
    out = RacoCompiler(spark).compile(plan).run()
    rows = sorted((r.src_ip, r.dst_ip, round(r.RATE, 6)) for r in out.collect())
    assert rows == [
        ("212.50.71.179", "147.32.84.229", round(875 / 3550.182373 / 1000.0, 6)),
        ("84.13.246.132", "147.32.84.229", round(135 / 0.000883 / 1000.0, 6)),
    ]
    assert out.columns == ["src_ip", "dst_ip", "RATE", "value"]


def test_scan_from_catalog_and_string_plus(spark):
    df = spark.createDataFrame([("a", "x", 5), ("b", "y", 1)], "s1 string, s2 string, n long")
    plan = """
    Dump(Apply([('joined', PLUS(NamedAttributeRef('s1'), NamedAttributeRef('s2'))),
                ('n2', PLUS(NamedAttributeRef('n'), NumericLiteral(1)))],
         Select(GT(NamedAttributeRef('n'), NumericLiteral(2)),
           Scan(RelationKey('public','adhoc','t'), Scheme([('s1', 'STRING_TYPE'), ('s2', 'STRING_TYPE'), ('n', 'LONG_TYPE')]), 10000,
                RepresentationProperties(frozenset([]), None, None)))))
    """
    out = RacoCompiler(spark, {"t": df}).compile(plan).run()
    assert [tuple(r) for r in out.collect()] == [("ax", 6)]


def test_long_division_stays_long(spark):
    df = spark.createDataFrame([(7, 2)], "a long, b long")
    plan = """Dump(Apply([('q', DIVIDE(NamedAttributeRef('a'), NamedAttributeRef('b')))],
              Scan(RelationKey('u','p','t'), Scheme([('a', 'LONG_TYPE'), ('b', 'LONG_TYPE')]), 10000,
                   RepresentationProperties(frozenset([]), None, None))))"""
    out = RacoCompiler(spark, {"t": df}).compile(plan).run()
    assert out.dtypes == [("q", "bigint")]
    assert out.collect()[0].q == 3


def test_filestore_roundtrip(spark, netflow_csv, tmp_path):
    out_dir = str(tmp_path / "raco_out")
    plan = f"""
    FileStore('file://{out_dir}', 'CSV', {{}},
      Apply([('SrcAddr', NamedAttributeRef('SrcAddr'))],
        FileScan('file://{netflow_csv}', 'CSV', {SCHEME}, {{'skip': 1}})))
    """
    RacoCompiler(spark).compile(plan).run()
    back = spark.read.option("header", "true").csv(out_dir)
    assert back.count() == 3


def test_unbalanced_plan_clear_error():
    with pytest.raises(ValueError, match="unexpected end of input"):
        parse_raco("Dump(Apply([('a', NamedAttributeRef('b'))]")


def test_datetime_scheme_parse_and_filter(spark, tmp_path_factory):
    """DATETIME_TYPE maps to TimestampType (beyond the reference, whose
    lowering throws on it — opt/RacoToAccumulo.kt:34): FileScan parses the
    column as a real timestamp and GT against a StringLiteral filters on
    time, not on string bytes."""
    d = tmp_path_factory.mktemp("raco_dt")
    p = os.path.join(str(d), "events.csv")
    with open(p, "w") as f:
        f.write(
            "name,seen\n"
            "early,1997-03-01 00:00:00\n"
            "late,1997-12-31 23:59:59\n"
            "later,1998-06-01 12:00:00\n"
        )
    scheme = "Scheme([('name', 'STRING_TYPE'), ('seen', 'DATETIME_TYPE')])"
    plan = f"""
    Dump(Apply([('name', NamedAttributeRef('name')), ('seen', NamedAttributeRef('seen'))],
      Select(GT(NamedAttributeRef('seen'), StringLiteral('1997-06-01 00:00:00')),
        FileScan('file://{p}', 'CSV', {scheme}, {{'skip': 1}}))))
    """
    out = RacoCompiler(spark).compile(plan).run()
    assert dict(out.dtypes)["seen"] == "timestamp"
    assert sorted(r.name for r in out.collect()) == ["late", "later"]
