"""WordPress→Drupal migration replayed as a golden e2e.

The REVERSE direction of ``test_drupal2wp_golden.py``, reproducing two
legs of the reference's ``usecases/databases/WP2Drupal.scala`` suite
with its actual DFASDL fixtures on live embedded Derby:

- **wp_users → drupal_users** (``WP2Drupal.scala:79-295``): aggregated
  MapOneToOne plus a transformer mix the forward direction does not
  exercise — Nullify, and the DateConverter → TimestampCalibrate
  (reduce) chain that lands epoch SECONDS in a num column;
- **wp_comments → drupal_comment** (``:1465-1733``): the
  DrupalVanCodeTransformer computes the per-article ``thread`` codes IN
  COOKBOOK CONTEXT — a frame-level transform (sibling numbering needs
  every row of the article), routed through the executor's
  FRAME_TRANSFORMERS mechanism.

Assertions are the reference's own golden values.
"""

from __future__ import annotations

import os

import pytest

from tensei_agent_spark.plans import ColumnRef, Mapping, Pipeline, Recipe, run_pipeline
from tensei_agent_spark.plans.dfasdl import source_spec, target_spec
from tensei_agent_spark.plans.spec import SourceSpec
from tensei_agent_spark.sinks.jdbc import jvm_execute
from tensei_agent_spark.sources import read_source

DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"
RES = "/root/reference/src/it/resources/usecases/databases/wp2drupal"

requires_fixtures = pytest.mark.skipif(
    not os.path.isdir(RES), reason="reference fixture corpus not present"
)


@pytest.fixture(scope="module")
def derby_url(spark, tmp_path_factory):
    home = tmp_path_factory.mktemp("derby_wp2drupal")
    spark._jvm.java.lang.System.setProperty("derby.system.home", str(home))
    return f"jdbc:derby:{home}/wp;create=true"


def _dfasdl(name: str) -> str:
    with open(f"{RES}/wp2drupal-wp4_22-d7_38-{name}.xml", encoding="utf-8") as fh:
        return fh.read()


# --- wp_users → drupal_users ---------------------------------------------------

# Source rows from WP2Drupal.scala:86-102.
USERS_DDL = [
    "CREATE TABLE wp_users (id BIGINT, user_login VARCHAR(60),"
    " user_pass VARCHAR(64), user_nicename VARCHAR(50),"
    " user_email VARCHAR(100), user_url VARCHAR(100),"
    " user_registered TIMESTAMP, user_activation_key VARCHAR(60),"
    " user_status INTEGER, display_name VARCHAR(250))",
    "INSERT INTO wp_users VALUES (1, 'chris',"
    " '$P$BLAHdQjsKTB4V/4IVmf2Z88SeyQ465.', 'chris',"
    " 'christian@wegtam.com', '', '2015-07-07 09:22:31', '', 0, 'chris')",
    "INSERT INTO wp_users VALUES (2, 'user2',"
    " '$P$Bu3nB/Vz3ENH0iHgFmsUBjqzo9xel4/', 'user2', 'a@b.de', '',"
    " '2015-07-08 07:34:07', '', 0, 'user2')",
    "INSERT INTO wp_users VALUES (3, 'user3',"
    " '$P$BTB/Z9hjf.aA5kf3llAknBA39nqg2u.', 'user3', 'c@d.de', '',"
    " '2015-07-08 07:34:48', '', 0, 'user3')",
]


def _users_pipeline(derby_url):
    src = source_spec(
        _dfasdl("source-wp_users"), "wp_users", derby_url, fmt="jdbc",
        seq_id="wp_users",
    )
    src.options.update({"driver": DRIVER, "table": "WP_USERS"})
    tgt = target_spec(
        _dfasdl("target-drupal_users"), "drupal_users", derby_url, fmt="jdbc",
        seq_id="drupal_users", mode="overwrite",
    )
    tgt.options.update({"driver": DRIVER, "table": "DRUPAL_USERS"})

    def ref(col):
        return ColumnRef("wp_users", col)

    # ≙ Cookbook "Users" (WP2Drupal.scala:116-228), mapping for mapping.
    recipe = Recipe(
        "wp-users", "drupal_users",
        mappings=(
            Mapping(
                (ref("user_email"), ref("id"), ref("user_login"), ref("user_email")),
                ("mail", "uid", "name", "init"),
            ),
            Mapping(
                (ref("display_name"),) * 2,
                ("data", "signature_format"),
                transformers=(("nullify", {}),),
            ),
            Mapping(
                (ref("user_registered"),), ("created",),
                transformers=(
                    ("date_converter", {}),
                    ("timestamp_calibrate", {"perform": "reduce"}),
                ),
            ),
            Mapping(
                (ref("id"),) * 4,
                ("language", "pass", "theme", "signature"),
                transformers=(("empty_string", {}),),
            ),
            Mapping(
                (ref("id"),) * 3,
                ("access", "login", "picture"),
                transformers=(("overwrite", {"value": "0", "type": "long"}),),
            ),
            Mapping(
                (ref("id"),), ("status",),
                transformers=(("overwrite", {"value": "1", "type": "long"}),),
            ),
            Mapping(
                (ref("id"),), ("timezone",),
                transformers=(
                    ("replace", {"search": (r"\d+",), "replace": "Europe/Berlin"}),
                ),
            ),
        ),
    )
    return Pipeline("wp2drupal-users", (src,), (tgt,), (recipe,))


@requires_fixtures
def test_wp_users_to_drupal_users_golden(spark, derby_url):
    jvm_execute(spark, derby_url, USERS_DDL, DRIVER)

    pipeline = _users_pipeline(derby_url)
    # Parser row count: 3 (WP2Drupal.scala:258-260).
    assert read_source(spark, pipeline.source("wp_users")).count() == 3

    run_pipeline(spark, pipeline)

    back = read_source(
        spark,
        SourceSpec(
            "DRUPAL_USERS", "jdbc", derby_url,
            options={"driver": DRIVER, "table": "DRUPAL_USERS"},
        ),
    ).orderBy("uid")
    rows = back.collect()

    # Golden values: WP2Drupal.scala:266-288.
    assert [r["uid"] for r in rows] == [1, 2, 3]
    chris = rows[0]
    assert chris["name"] == "chris"
    assert chris["pass"] == ""
    assert chris["mail"] == "christian@wegtam.com"
    assert chris["theme"] == ""
    assert chris["signature"] == ""
    assert chris["signature_format"] is None
    assert chris["created"] == 1436260951
    assert chris["access"] == 0
    assert chris["login"] == 0
    assert chris["status"] == 1
    assert chris["timezone"] == "Europe/Berlin"
    assert chris["language"] == ""
    assert chris["picture"] == 0
    assert chris["init"] == "christian@wegtam.com"
    assert chris["data"] is None
    assert [r["name"] for r in rows] == ["chris", "user2", "user3"]


# --- wp_comments → drupal_comment (vancode in cookbook context) -----------------

# Source rows from WP2Drupal.scala:1471-1497; content strings carry the
# H2 dump's literal backslash-n sequences, not asserted here.
COMMENTS_DDL = [
    "CREATE TABLE wp_comments (comment_id BIGINT, comment_post_id BIGINT,"
    " comment_author VARCHAR(255), comment_author_email VARCHAR(100),"
    " comment_author_url VARCHAR(200), comment_author_ip VARCHAR(100),"
    " comment_date TIMESTAMP, comment_date_gmt TIMESTAMP,"
    " comment_content VARCHAR(2000), comment_karma INTEGER,"
    " comment_approved VARCHAR(20), comment_agent VARCHAR(255),"
    " comment_type VARCHAR(20), comment_parent BIGINT, user_id BIGINT)",
    "INSERT INTO wp_comments VALUES(1, 1, 'Mr WordPress', '',"
    " 'https://wordpress.org/', '', '2015-07-07 11:22:31',"
    " '2015-07-07 09:22:31', 'Hi, das ist ein Kommentar.', 0, '1', '',"
    " '', 0, 0)",
    "INSERT INTO wp_comments VALUES(2, 9, 'chris',"
    " 'christian_tessnow@yahoo.de', '', '127.0.0.1',"
    " '2015-07-08 09:44:09', '2015-07-08 07:44:09', 'cooler artikel',"
    " 0, '1', 'Mozilla/5.0', '', 0, 1)",
    "INSERT INTO wp_comments VALUES(3, 9, 'chris',"
    " 'christian_tessnow@yahoo.de', '', '127.0.0.1',"
    " '2015-07-08 09:44:34', '2015-07-08 07:44:34',"
    " 'hier kommentiert der admin noch selbst', 0, '1', 'Mozilla/5.0',"
    " '', 0, 1)",
    "INSERT INTO wp_comments VALUES(4, 9, 'user2', 'a@b.de', '',"
    " '127.0.0.1', '2015-07-08 09:45:56', '2015-07-08 07:45:56',"
    " 'user comment', 0, '1', 'Mozilla/5.0', '', 0, 2)",
    "INSERT INTO wp_comments VALUES(5, 1, 'user2', 'a@b.de', '',"
    " '127.0.0.1', '2015-07-08 09:49:03', '2015-07-08 07:49:03',"
    " 'bitte löschen!', 0, '1', 'Mozilla/5.0', '', 0, 2)",
    "INSERT INTO wp_comments VALUES(6, 1, 'chris',"
    " 'christian_tessnow@yahoo.de', '', '127.0.0.1',"
    " '2015-07-24 12:33:05', '2015-07-24 10:33:05', 'REPLY', 0, '1',"
    " 'Mozilla/5.0', '', 1, 1)",
    "INSERT INTO wp_comments VALUES(7, 1, 'chris', 'c@t.de', '',"
    " '127.0.0.1', '2015-07-27 09:32:36', '2015-07-27 07:32:36',"
    " 'Antwort2', 0, '1', 'Mozilla/5.0', '', 1, 0)",
    "INSERT INTO wp_comments VALUES(8, 1, 'chris', 'c@t.de', '',"
    " '127.0.0.1', '2015-07-27 09:32:52', '2015-07-27 07:32:52',"
    " 'REPLY2', 0, '1', 'Mozilla/5.0', '', 6, 0)",
]


def _comments_pipeline(derby_url):
    src = source_spec(
        _dfasdl("source-wp_comments"), "wpc", derby_url, fmt="jdbc",
        seq_id="wp_comments",
    )
    src.options.update({"driver": DRIVER, "table": "WP_COMMENTS"})
    tgt = target_spec(
        _dfasdl("target-drupal_comment"), "drupal_comment", derby_url,
        fmt="jdbc", seq_id="drupal_comment", mode="overwrite",
    )
    tgt.options.update({"driver": DRIVER, "table": "DRUPAL_COMMENT"})

    def ref(col):
        return ColumnRef("wpc", col)

    cal = (
        ("date_converter", {}),
        ("timestamp_calibrate", {"perform": "reduce"}),
    )
    # ≙ Cookbook "Comments" (WP2Drupal.scala:1515-1646), mapping for
    # mapping — the final mapping is the frame-level vancode.
    recipe = Recipe(
        "wp-comments", "drupal_comment",
        mappings=(
            Mapping((ref("comment_id"),), ("cid",)),
            Mapping((ref("comment_parent"),), ("pid",)),
            Mapping((ref("comment_post_id"),), ("nid",)),
            Mapping((ref("user_id"),), ("uid",)),
            Mapping(
                (ref("comment_author_ip"),), ("hostname",),
                transformers=(("replace", {"search": ("^$",), "replace": ""}),),
            ),
            Mapping((ref("comment_approved"),), ("status",)),
            Mapping((ref("comment_author"),), ("name",)),
            Mapping((ref("comment_author_email"),), ("mail",)),
            Mapping((ref("comment_author_url"),), ("homepage",)),
            Mapping((ref("comment_date_gmt"),), ("created",), transformers=cal),
            Mapping((ref("comment_date_gmt"),), ("changed",), transformers=cal),
            Mapping(
                (ref("comment_type"),), ("subject",),
                transformers=(("empty_string", {}),),
            ),
            Mapping(
                (ref("comment_type"),), ("language",),
                transformers=(("overwrite", {"value": "und", "type": "string"}),),
            ),
            Mapping(
                (ref("comment_id"), ref("comment_post_id"), ref("comment_parent")),
                ("thread",),
                mode="all_to_all",
                transformers=(("drupal_vancode", {}),),
            ),
        ),
    )
    return Pipeline("wp2drupal-comments", (src,), (tgt,), (recipe,))


@requires_fixtures
def test_wp_comments_to_drupal_comment_golden(spark, derby_url):
    jvm_execute(spark, derby_url, COMMENTS_DDL, DRIVER)

    pipeline = _comments_pipeline(derby_url)
    # Parser row count: 8 (WP2Drupal.scala:1664-1666).
    assert read_source(spark, pipeline.source("wpc")).count() == 8

    run_pipeline(spark, pipeline)

    back = read_source(
        spark,
        SourceSpec(
            "DRUPAL_COMMENT", "jdbc", derby_url,
            options={"driver": DRIVER, "table": "DRUPAL_COMMENT"},
        ),
    ).orderBy("cid")
    rows = back.collect()

    # Golden values: WP2Drupal.scala:1673-1725.
    assert [r["cid"] for r in rows] == [1, 2, 3, 4, 5, 6, 7, 8]
    first, second = rows[0], rows[1]
    assert (first["pid"], first["nid"], first["uid"]) == (0, 1, 0)
    assert first["hostname"] == ""
    assert first["status"] == 1
    assert first["name"] == "Mr WordPress"
    assert first["mail"] == ""
    assert first["homepage"] == "https://wordpress.org/"
    assert first["created"] == 1436260951
    assert first["changed"] == 1436260951
    assert first["subject"] == ""
    assert first["language"] == "und"
    assert first["thread"] == "01/"
    assert (second["pid"], second["nid"], second["uid"]) == (0, 9, 1)
    assert second["hostname"] == "127.0.0.1"
    assert second["name"] == "chris"
    assert second["mail"] == "christian_tessnow@yahoo.de"
    assert second["homepage"] == ""
    assert second["created"] == 1436341449
    assert second["changed"] == 1436341449
    assert second["thread"] == "01/"
    assert rows[2]["thread"] == "02/"
    assert rows[3]["thread"] == "03/"
