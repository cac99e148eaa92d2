"""TREC topic-file source (S4) and run sink (S14)."""

from search_engine_spark.sources.queries import parse_topics, read_topic_file

TOPICS = """
<top>
<num> Number: 351
<title> Falkland petroleum exploration
<desc> Description:
What information is available on petroleum exploration in
the South Atlantic near the Falkland Islands?  Documents discussing
drilling plans near the islands. More text here.
<narr> Narrative: ignored entirely.
</top>
<top>
<num> Number: 352
<title> British Chunnel impact
<desc> Description:
Impact of the Chunnel on the British economy.
</top>
<top>
<num> Number: 340
<title> Land mine ban
</top>
"""


def test_parse_topics_sorted_and_fields():
    got = parse_topics(TOPICS)
    assert [q[0] for q in got] == ["340", "351", "352"]  # TreeMap order (K5)
    by_id = {qid: (t, d) for qid, t, d in got}
    assert by_id["351"][0] == "Falkland petroleum exploration"
    # desc: fragment after "discuss" up to the first "." only
    assert by_id["351"][1] == "ing\ndrilling plans near the islands"
    # no "discuss" in desc => empty (Searcher.java:233-237)
    assert by_id["352"] == ("British Chunnel impact", "")
    assert by_id["340"] == ("Land mine ban", "")


def test_read_topic_file(tmp_path):
    p = tmp_path / "topics.txt"
    p.write_text(TOPICS)
    pairs = read_topic_file(str(p))
    assert pairs[0] == ("340", "Land mine ban")
    assert pairs[1][1].startswith("Falkland petroleum exploration@ing")


def test_trec_run_lines(spark):
    from search_engine_spark.sources.sinks import trec_run_lines

    res = spark.createDataFrame(
        [("q2", 1, "doc9", 3.5), ("q1", 2, "doc2", 1.25), ("q1", 1, "doc7", 2.0)],
        "qid string, rank int, url string, score double",
    )
    lines = [r["line"] for r in trec_run_lines(res).collect()]
    assert lines == [
        "q1 Q0 doc7 1 2.000000 mt",
        "q1 Q0 doc2 2 1.250000 mt",
        "q2 Q0 doc9 1 3.500000 mt",
    ]
