"""Drupal→WordPress migration replayed as a golden e2e.

Reproduces the reference's ``usecases/databases/Drupal2WP.scala``
integration suite end-to-end on this engine:

- the *actual reference DFASDL files*
  (``src/it/resources/usecases/databases/drupal2wp/…``) compile through
  :mod:`tensei_agent_spark.plans.dfasdl` into Source/Target specs —
  including the ``filter="uid > 0"`` row predicate on ``users`` and the
  three-table ``db-select`` join override on ``node``;
- the cookbook's recipes translate mapping-for-mapping (same element
  routing, same transformer chains: Replace / EmptyString / Overwrite /
  DateConverter + atomic TimestampAdjuster);
- source and target are both LIVE JDBC databases (Derby embedded — the
  reference runs H2; both are its integration dialects);
- the assertions are the reference's own golden values
  (``Drupal2WP.scala:252-278`` for wp_users, ``:563-615`` for
  wp_posts, ``:819-860`` for wp_comments), including the exact
  migrated timestamps.
"""

from __future__ import annotations

import os
from datetime import datetime

import pytest

from tensei_agent_spark.plans import (
    ColumnRef,
    Mapping,
    Pipeline,
    Recipe,
    run_pipeline,
)
from tensei_agent_spark.plans.dfasdl import source_spec, target_spec
from tensei_agent_spark.sinks.jdbc import jvm_execute
from tensei_agent_spark.sources import read_source
from tensei_agent_spark.plans.spec import SourceSpec

DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"
RES = "/root/reference/src/it/resources/usecases/databases/drupal2wp"

requires_fixtures = pytest.mark.skipif(
    not os.path.isdir(RES), reason="reference fixture corpus not present"
)


@pytest.fixture(scope="module")
def derby_url(spark, tmp_path_factory):
    home = tmp_path_factory.mktemp("derby_drupal")
    spark._jvm.java.lang.System.setProperty("derby.system.home", str(home))
    return f"jdbc:derby:{home}/drupal;create=true"


def _dfasdl(name: str) -> str:
    with open(f"{RES}/drupal2wp-d7_39-wp4_3-{name}.xml", encoding="utf-8") as fh:
        return fh.read()


# --- users → wp_users ---------------------------------------------------------

# Source rows from Drupal2WP.scala:100-106 (trimmed to the columns the
# cookbook touches plus the filter column; H2's ``int(10)``/bare
# ``varchar`` become Derby-legal types — dialect scaffolding, not the
# semantics under test).
USERS_DDL = [
    "CREATE TABLE users (uid INTEGER, name VARCHAR(60), pass VARCHAR(128),"
    " mail VARCHAR(254), theme VARCHAR(255), signature VARCHAR(255),"
    " signature_format VARCHAR(255), created INTEGER, access INTEGER,"
    " login INTEGER, status INTEGER, timezone VARCHAR(32),"
    " language VARCHAR(12), picture INTEGER, init VARCHAR(254),"
    " data VARCHAR(255))",
    "INSERT INTO users VALUES(0, '', '', '', '', '', NULL, 0, 0, 0, 0,"
    " NULL, '', 0, '', NULL)",
    "INSERT INTO users VALUES(1, 'admin', '$S$D2Lz7Va9sE', 'test@localhost.de',"
    " '', '', NULL, 1441196805, 1441197933, 1441196869, 1, 'Europe/Berlin',"
    " '', 0, 'test@localhost.de', 'b:0;')",
    "INSERT INTO users VALUES(2, 'andre', '$S$DAADq1F6ms', 'andre@localhost.de',"
    " '', '', 'filtered_html', 1441197462, 1441197998, 1441197998, 1,"
    " 'Europe/Berlin', '', 0, 'andre@localhost.de', NULL)",
    "INSERT INTO users VALUES(3, 'jens', '$S$DZOH5WEzRe', 'jens@localhost.de',"
    " '', '', 'filtered_html', 1441197476, 1441197952, 1441197952, 1,"
    " 'Europe/Berlin', '', 0, 'jens@localhost.de', NULL)",
    "INSERT INTO users VALUES(4, 'frank', '$S$DSXwzTIj.N', 'frank@localhost.de',"
    " '', '', 'filtered_html', 1441197489, 1441198082, 1441198082, 1,"
    " 'Europe/Berlin', '', 0, 'frank@localhost.de', NULL)",
]


def _users_pipeline(derby_url):
    src = source_spec(
        _dfasdl("source-drupal_users"), "users", derby_url, fmt="jdbc",
        seq_id="users",
    )
    src.options.update({"driver": DRIVER, "table": "users"})
    tgt = target_spec(
        _dfasdl("target-wp_users"), "wp_users", derby_url, fmt="jdbc",
        seq_id="wp_users", mode="overwrite",
    )
    tgt.options.update({"driver": DRIVER, "table": "WP_USERS"})

    def ref(col):
        return ColumnRef("users", col)

    # ≙ Cookbook "Drupal-Users" (Drupal2WP.scala:131-216), mapping for
    # mapping in the same order.
    recipe = Recipe(
        "drupal-users", "wp_users",
        mappings=(
            Mapping((ref("uid"),), ("id",)),
            Mapping(
                (ref("mail"),), ("user_email",),
                transformers=(
                    ("replace", {"search": ("^$",), "replace": "TEST@EXAMPLE.COM"}),
                ),
            ),
            Mapping(
                (ref("name"), ref("name"), ref("name")),
                ("user_login", "user_nicename", "display_name"),
                transformers=(("replace", {"search": ("^$",), "replace": "anonymous"}),),
            ),
            Mapping(
                (ref("uid"), ref("uid"), ref("uid")),
                ("user_pass", "user_url", "user_activation_key"),
                transformers=(("empty_string", {}),),
            ),
            Mapping(
                (ref("uid"),), ("user_status",),
                transformers=(("overwrite", {"value": "0", "type": "long"}),),
            ),
            Mapping(
                (ref("created"),), ("user_registered",),
                transformers=(("date_converter", {}),),
                atomic=(("timestamp_adjuster", {}),),
            ),
        ),
    )
    return Pipeline("drupal2wp-users", (src,), (tgt,), (recipe,))


@requires_fixtures
def test_users_to_wp_users_golden(spark, derby_url):
    jvm_execute(spark, derby_url, USERS_DDL, DRIVER)

    pipeline = _users_pipeline(derby_url)
    # The DFASDL seq filter (uid > 0) must drop the anonymous row:
    # parser row count is 4 in the reference (Drupal2WP.scala:243).
    users = read_source(spark, pipeline.source("users"))
    assert users.count() == 4

    run_pipeline(spark, pipeline)

    back = read_source(
        spark,
        SourceSpec(
            "WP_USERS", "jdbc", derby_url,
            options={"driver": DRIVER, "table": "WP_USERS"},
        ),
    ).orderBy("id")
    rows = back.collect()

    # Golden values: Drupal2WP.scala:252-278.
    assert [r["id"] for r in rows] == [1, 2, 3, 4]
    assert [r["user_login"] for r in rows] == ["admin", "andre", "jens", "frank"]
    andre = rows[1]
    assert andre["user_pass"] == ""
    assert andre["user_nicename"] == "andre"
    assert andre["user_email"] == "andre@localhost.de"
    assert andre["user_url"] == ""
    assert andre["user_registered"] == datetime(2015, 9, 2, 12, 37, 42)
    assert andre["user_activation_key"] == ""
    assert andre["user_status"] == 0
    assert andre["display_name"] == "andre"


# --- node (+body, +comment stats) → wp_posts ----------------------------------

BODY_1 = (
    "Dieser Artikel enthält keinen besonderen Text und wurde mit einfachen"
    " Mitteln erstellt. Das Inhalt ist eher nebensächlich und kann getrost"
    " als uninteressant angesehen werden. Dennoch ist es wichtig, dass es"
    " diese Beispielinhalte gibt, denn nur so kann die Migration der Daten"
    " mit den Möglichkeiten von Tensei-Data gezeigt werden.\\r\\n\\r\\nAlso,"
    " schnell auf den Knopf drücken und der Migration zuschauen!"
)
BODY_4 = (
    "Unter diesem Artikel soll es eine Vielzahl von Kommentaren geben."
    " Dadurch kann sehr schön gezeigt werden, wie die Migration der"
    " Kommentare vonstatten geht.\\r\\n\\r\\nKommentare können einfache"
    " Antworten auf einen Artikel sein, oder verschachtelt untereinander"
    " vorkommen. Auch diese Verschachtelungen sollen ordnungsgemäß"
    " übernommen werden.\\r\\n\\r\\nNa dann, viel Spass mit der"
    " Kommentarfunktion."
)

NODE_DDL = [
    "CREATE TABLE node (nid INTEGER, vid INTEGER, type VARCHAR(32),"
    " language VARCHAR(12), title VARCHAR(255), uid INTEGER, status INTEGER,"
    " created INTEGER, changed INTEGER, comment INTEGER, promote INTEGER,"
    ' sticky INTEGER, tnid INTEGER, "translate" INTEGER)',
    "INSERT INTO node VALUES(1, 1, 'article', 'und',"
    " 'Die ist ein einfacher Artikel', 2, 1, 1441197543, 1441283821, 2, 1, 0, 0, 0)",
    "INSERT INTO node VALUES(2, 2, 'article', 'und',"
    " 'Migration mit Tensei-Data', 3, 1, 1441197796, 1441197796, 2, 1, 0, 0, 0)",
    "INSERT INTO node VALUES(3, 3, 'article', 'und',"
    " 'Hundefutter ist wichtig', 4, 1, 1441197893, 1441197893, 2, 1, 0, 0, 0)",
    "INSERT INTO node VALUES(4, 4, 'article', 'und',"
    " 'Dieser Artikel soll dann mal Kommentare enthalten', 2, 1, 1441197923,"
    " 1441197923, 2, 1, 0, 0, 0)",
    "CREATE TABLE field_data_body (entity_type VARCHAR(128), bundle VARCHAR(128),"
    " deleted INTEGER, entity_id INTEGER, revision_id INTEGER,"
    " language VARCHAR(32), delta INTEGER, body_value VARCHAR(2000),"
    " body_summary VARCHAR(2000), body_format VARCHAR(255))",
    f"INSERT INTO field_data_body VALUES('node', 'article', 0, 1, 1, 'und', 0,"
    f" '{BODY_1}', '', 'full_html')",
    "INSERT INTO field_data_body VALUES('node', 'article', 0, 2, 2, 'und', 0,"
    " 'Tensei-Data ist ein Datenmigrationswerkzeug.', '', 'plain_text')",
    "INSERT INTO field_data_body VALUES('node', 'article', 0, 3, 3, 'und', 0,"
    " 'Damit es ihrem kleinen Vierbeiner gut geht.', '', 'filtered_html')",
    f"INSERT INTO field_data_body VALUES('node', 'article', 0, 4, 4, 'und', 0,"
    f" '{BODY_4}', '', 'filtered_html')",
    "CREATE TABLE node_comment_statistics (nid INTEGER, cid INTEGER,"
    " last_comment_timestamp INTEGER, last_comment_name VARCHAR(60),"
    " last_comment_uid INTEGER, comment_count INTEGER)",
    "INSERT INTO node_comment_statistics VALUES(1, 0, 1441197543, NULL, 2, 0)",
    "INSERT INTO node_comment_statistics VALUES(2, 0, 1441197796, NULL, 3, 0)",
    "INSERT INTO node_comment_statistics VALUES(3, 0, 1441197893, NULL, 4, 0)",
    "INSERT INTO node_comment_statistics VALUES(4, 5, 1441198100, '', 4, 5)",
]


def _posts_pipeline(derby_url):
    src = source_spec(
        _dfasdl("source-drupal_node"), "node", derby_url, fmt="jdbc",
        seq_id="node",
    )
    # The DFASDL's db-select is MySQL-quoted; strip the backticks for
    # Derby (unquoted identifiers resolve case-insensitively on both).
    src.options["query"] = src.options["query"].replace("`", "")
    src.options.update({"driver": DRIVER})
    tgt = target_spec(
        _dfasdl("target-wp_posts"), "wp_posts", derby_url, fmt="jdbc",
        seq_id="wp_posts", mode="overwrite",
    )
    tgt.options.update({"driver": DRIVER, "table": "WP_POSTS"})

    def ref(col):
        return ColumnRef("node", col)

    empty = (("empty_string", {}),)
    # ≙ Cookbook "Drupal-Users" recipe of the node→posts test
    # (Drupal2WP.scala:377-533), same order.
    recipe = Recipe(
        "drupal-posts", "wp_posts",
        mappings=(
            Mapping((ref("nid"), ref("uid")), ("id", "post_author")),
            Mapping(
                (ref("created"),) * 4,
                ("post_date", "post_date_gmt", "post_modified", "post_modified_gmt"),
                transformers=(("date_converter", {}),),
                atomic=(("timestamp_adjuster", {}),),
            ),
            Mapping(
                (ref("body_value"), ref("title")),
                ("post_content", "post_title"),
                transformers=(("replace", {"search": ("^$",), "replace": ""}),),
            ),
            Mapping(
                (ref("nid"),) * 6,
                ("post_excerpt", "post_password", "to_ping", "pinged",
                 "post_content_filtered", "post_mime_type"),
                transformers=empty,
            ),
            Mapping(
                (ref("status"),), ("post_status",),
                transformers=(
                    ("replace", {"search": ("1",), "replace": "publish"}),
                    ("replace", {"search": ("0",), "replace": "pending"}),
                ),
            ),
            Mapping(
                (ref("comment"),), ("comment_status",),
                transformers=(
                    ("replace", {"search": ("0",), "replace": "closed"}),
                    ("replace", {"search": ("1", "2"), "replace": "open"}),
                ),
            ),
            Mapping(
                (ref("nid"),), ("ping_status",),
                transformers=(("overwrite", {"value": "open", "type": "string"}),),
            ),
            Mapping(
                (ref("nid"), ref("nid")), ("post_parent", "menu_order"),
                transformers=(("overwrite", {"value": "0", "type": "long"}),),
            ),
            Mapping(
                (ref("title"),), ("post_name",),
                transformers=(("replace", {"search": ("[^a-zA-Z0-9]+",), "replace": "-"}),),
            ),
            Mapping((ref("nid"),), ("guid",), transformers=empty),
            Mapping(
                (ref("type"),), ("post_type",),
                transformers=(("replace", {"search": ("article",), "replace": "post"}),),
            ),
            Mapping((ref("comment_count"),), ("comment_count",)),
        ),
    )
    return Pipeline("drupal2wp-posts", (src,), (tgt,), (recipe,))


@requires_fixtures
def test_node_to_wp_posts_golden(spark, derby_url):
    jvm_execute(spark, derby_url, NODE_DDL, DRIVER)

    pipeline = _posts_pipeline(derby_url)
    # db-select three-table join feeds the parser: 4 rows
    # (Drupal2WP.scala:551-553).
    assert read_source(spark, pipeline.source("node")).count() == 4

    run_pipeline(spark, pipeline)

    back = read_source(
        spark,
        SourceSpec(
            "WP_POSTS", "jdbc", derby_url,
            options={"driver": DRIVER, "table": "WP_POSTS"},
        ),
    ).orderBy("id")
    rows = back.collect()

    # Golden values: Drupal2WP.scala:563-615.
    assert [r["id"] for r in rows] == [1, 2, 3, 4]
    first, fourth = rows[0], rows[3]
    assert first["post_author"] == 2
    assert first["post_date"] == datetime(2015, 9, 2, 12, 39, 3)
    assert first["post_date_gmt"] == datetime(2015, 9, 2, 12, 39, 3)
    assert first["post_content"] == BODY_1
    assert first["post_title"] == "Die ist ein einfacher Artikel"
    assert first["post_status"] == "publish"
    assert first["comment_status"] == "open"
    assert first["ping_status"] == "open"
    assert first["post_name"] == "Die-ist-ein-einfacher-Artikel"
    assert first["post_type"] == "post"
    assert first["comment_count"] == 0
    assert rows[1]["post_author"] == 3
    assert fourth["post_author"] == 2
    assert fourth["post_date"] == datetime(2015, 9, 2, 12, 45, 23)
    assert fourth["post_content"] == BODY_4
    assert fourth["post_title"] == "Dieser Artikel soll dann mal Kommentare enthalten"
    assert fourth["post_status"] == "publish"
    assert fourth["comment_status"] == "open"
    assert fourth["post_name"] == "Dieser-Artikel-soll-dann-mal-Kommentare-enthalten"
    assert fourth["comment_count"] == 5


# --- comment (+body) → wp_comments --------------------------------------------

# Source rows from Drupal2WP.scala:626-670 (H2 ``int(11)``/bare
# ``varchar`` become Derby-legal types, as above).
COMMENT_DDL = [
    "CREATE TABLE comment (cid INTEGER, pid INTEGER, nid INTEGER,"
    " uid INTEGER, subject VARCHAR(64), hostname VARCHAR(128),"
    " created INTEGER, changed INTEGER, status INTEGER,"
    " thread VARCHAR(255), name VARCHAR(60), mail VARCHAR(64),"
    " homepage VARCHAR(255), language VARCHAR(12))",
    "INSERT INTO comment VALUES(1, 0, 4, 3,"
    " 'das ist das erste Kommentar in der ersten Ebene', '::1',"
    " 1441197973, 1441197973, 1, '01/', 'jens', '', '', 'und')",
    "INSERT INTO comment VALUES(2, 0, 4, 3,"
    " 'und dann der zweite Kommentar in der ersten Ebene', '::1',"
    " 1441197989, 1441197989, 1, '02/', 'jens', '', '', 'und')",
    "INSERT INTO comment VALUES(3, 0, 4, 2,"
    " 'Ein Kommentar in der ersten', '::1', 1441198023, 1441198023, 1,"
    " '03/', 'andre', '', '', 'und')",
    "INSERT INTO comment VALUES(4, 1, 4, 2,"
    " 'Antwort auf den ersten Kommentar ohne Comment-Text', '::1',"
    " 1441198074, 1441198074, 1, '01.00/', 'andre', '', '', 'und')",
    "INSERT INTO comment VALUES(5, 4, 4, 4, 'zweite Antwort', '::1',"
    " 1441198100, 1441198100, 1, '01.00.00/', 'frank', '', '', 'und')",
    "CREATE TABLE field_data_comment_body (entity_type VARCHAR(128),"
    " bundle VARCHAR(128), deleted INTEGER, entity_id INTEGER,"
    " revision_id INTEGER, language VARCHAR(32), delta INTEGER,"
    " comment_body_value VARCHAR(2000), comment_body_format VARCHAR(255))",
    "INSERT INTO field_data_comment_body VALUES('comment',"
    " 'comment_node_article', 0, 1, 1, 'und', 0,"
    " 'Und hier steht der Inhalt des Kommentares.', 'filtered_html')",
    "INSERT INTO field_data_comment_body VALUES('comment',"
    " 'comment_node_article', 0, 2, 2, 'und', 0, 'MIT INHALT', 'filtered_html')",
    "INSERT INTO field_data_comment_body VALUES('comment',"
    " 'comment_node_article', 0, 3, 3, 'und', 0,"
    " 'Ein Kommentar in der ersten Ebene ohne Subject', 'filtered_html')",
    "INSERT INTO field_data_comment_body VALUES('comment',"
    " 'comment_node_article', 0, 4, 4, 'und', 0, 'oder doch', 'filtered_html')",
    "INSERT INTO field_data_comment_body VALUES('comment',"
    " 'comment_node_article', 0, 5, 5, 'und', 0,"
    " 'in der dritten Ebene vom ersten Kommentar', 'filtered_html')",
]


def _comments_pipeline(derby_url):
    src = source_spec(
        _dfasdl("source-drupal_comment"), "comment", derby_url, fmt="jdbc",
        seq_id="comment",
    )
    src.options.update({"driver": DRIVER})
    tgt = target_spec(
        _dfasdl("target-wp_comments"), "wp_comments", derby_url, fmt="jdbc",
        seq_id="wp_comments", mode="overwrite",
    )
    tgt.options.update({"driver": DRIVER, "table": "WP_COMMENTS"})

    def ref(col):
        return ColumnRef("comment", col)

    # ≙ Cookbook "Drupal-Comment" (Drupal2WP.scala:683-785), mapping for
    # mapping in the same order.
    recipe = Recipe(
        "drupal-comments", "wp_comments",
        mappings=(
            Mapping((ref("cid"),), ("comment_id",)),
            Mapping((ref("nid"),), ("comment_post_id",)),
            Mapping((ref("name"),), ("comment_author",)),
            Mapping((ref("mail"),), ("comment_author_email",)),
            Mapping((ref("homepage"),), ("comment_author_url",)),
            Mapping((ref("hostname"),), ("comment_author_ip",)),
            Mapping((ref("status"),), ("comment_approved",)),
            Mapping((ref("pid"),), ("comment_parent",)),
            Mapping((ref("uid"),), ("user_id",)),
            Mapping(
                (ref("created"),) * 2,
                ("comment_date", "comment_date_gmt"),
                transformers=(("date_converter", {}),),
                atomic=(("timestamp_adjuster", {}),),
            ),
            Mapping(
                (ref("cid"),), ("comment_karma",),
                transformers=(("overwrite", {"value": "0", "type": "long"}),),
            ),
            # Concat separator is the literal two-character "\n" string —
            # the reference passes Scala "\\n" and its golden values
            # contain backslash-n verbatim (Drupal2WP.scala:833-835).
            Mapping(
                (ref("subject"), ref("comment_body_value")),
                ("comment_content",),
                mode="all_to_all",
                transformers=(("concat", {"separator": "\\n"}),),
            ),
            Mapping(
                (ref("cid"),) * 2,
                ("comment_agent", "comment_type"),
                transformers=(("empty_string", {}),),
            ),
        ),
    )
    return Pipeline("drupal2wp-comments", (src,), (tgt,), (recipe,))


@requires_fixtures
def test_comment_to_wp_comments_golden(spark, derby_url):
    jvm_execute(spark, derby_url, COMMENT_DDL, DRIVER)

    pipeline = _comments_pipeline(derby_url)
    # db-select LEFT JOIN comment↔field_data_comment_body feeds the
    # parser: 5 rows (Drupal2WP.scala:808-810).
    assert read_source(spark, pipeline.source("comment")).count() == 5

    run_pipeline(spark, pipeline)

    back = read_source(
        spark,
        SourceSpec(
            "WP_COMMENTS", "jdbc", derby_url,
            options={"driver": DRIVER, "table": "WP_COMMENTS"},
        ),
    ).orderBy("comment_id")
    rows = back.collect()

    # Golden values: Drupal2WP.scala:819-860.
    assert [r["comment_id"] for r in rows] == [1, 2, 3, 4, 5]
    first, fifth = rows[0], rows[4]
    assert first["comment_post_id"] == 4
    assert first["comment_author"] == "jens"
    assert first["comment_author_email"] == ""
    assert first["comment_author_url"] == ""
    assert first["comment_author_ip"] == "::1"
    assert first["comment_date"] == datetime(2015, 9, 2, 12, 46, 13)
    assert first["comment_date_gmt"] == datetime(2015, 9, 2, 12, 46, 13)
    assert first["comment_content"] == (
        "das ist das erste Kommentar in der ersten Ebene\\n"
        "Und hier steht der Inhalt des Kommentares."
    )
    assert first["comment_karma"] == 0
    assert first["comment_approved"] == "1"
    assert first["comment_agent"] == ""
    assert first["comment_type"] == ""
    assert first["comment_parent"] == 0
    assert first["user_id"] == 3
    assert fifth["comment_post_id"] == 4
    assert fifth["comment_author"] == "frank"
    assert fifth["comment_content"] == (
        "zweite Antwort\\nin der dritten Ebene vom ersten Kommentar"
    )
    assert fifth["comment_karma"] == 0
    assert fifth["comment_approved"] == "1"
    assert fifth["comment_agent"] == ""
    assert fifth["comment_type"] == ""
    assert fifth["comment_parent"] == 4
