"""WordPress→Joomla migration replayed as a golden e2e.

Completes the CMS-migration matrix (Drupal2WP, Joomla2WP, WP2Drupal —
and now the reverse WP→Joomla direction), reproducing ALL THREE legs of
the reference's ``usecases/databases/WP2Joomla.scala``:

- wp_users    → joomla_users    (``WP2Joomla.scala:79-332``)
- wp_posts    → joomla_content  (``WP2Joomla.scala:334-727``) — the seq
  ``filter="post_type = 'post' OR post_type = 'page'"`` must drop the
  6 revision rows (11 source rows → 5 parsed), and the alias is built
  by a THREE-step Replace chain (specials→'-', squeeze '-', strip ends)
- wp_comments → joomla_jcomments (``WP2Joomla.scala:729-1010``)

using the *actual reference DFASDL files*
(``src/it/resources/usecases/databases/wp2joomla/…``), live embedded
Derby on both ends, and the reference's own golden values.

New transformer surface pinned here: ``Overwrite`` with type=datetime
and NO value must emit the reference's per-type default — the epoch
``1970-01-01 00:00:00`` (``Overwrite.scala:44-52``), asserted through
``lastresettime`` / ``checked_out_time`` / ``publish_down``.
"""

from __future__ import annotations

import os
from datetime import datetime

import pytest

from tensei_agent_spark.plans import ColumnRef, Mapping, Pipeline, Recipe, run_pipeline
from tensei_agent_spark.plans.dfasdl import source_spec, target_spec
from tensei_agent_spark.plans.spec import SourceSpec
from tensei_agent_spark.sinks.jdbc import jvm_execute
from tensei_agent_spark.sources import read_source

DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"
RES = "/root/reference/src/it/resources/usecases/databases/wp2joomla"

requires_fixtures = pytest.mark.skipif(
    not os.path.isdir(RES), reason="reference fixture corpus not present"
)

EPOCH = datetime(1970, 1, 1, 0, 0, 0)


@pytest.fixture(scope="module")
def derby_url(spark, tmp_path_factory):
    home = tmp_path_factory.mktemp("derby_wordpress")
    spark._jvm.java.lang.System.setProperty("derby.system.home", str(home))
    return f"jdbc:derby:{home}/wordpress;create=true"


def _dfasdl(name: str) -> str:
    with open(f"{RES}/wp2joomla-wp4_22-j3_43-{name}.xml", encoding="utf-8") as fh:
        return fh.read()


# --- wp_users → joomla_users ---------------------------------------------------

# Source rows from WP2Joomla.scala:85-102 (H2 int(11)/datetime become
# Derby-legal types — dialect scaffolding, not the semantics under test).
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
    src.options.update({"driver": DRIVER, "table": "wp_users"})
    tgt = target_spec(
        _dfasdl("target-joomla_users"), "joomla_users", derby_url, fmt="jdbc",
        seq_id="joomla_users", mode="overwrite",
    )
    tgt.options.update({"driver": DRIVER, "table": "JOOMLA_USERS"})

    def ref(col):
        return ColumnRef("wp_users", col)

    # ≙ Cookbook "Users" (WP2Joomla.scala:117-267), mapping for mapping:
    # one aggregated 5→5 MapOneToOne, the id rebase x>0 → x=x+819, and
    # the no-value Overwrite(datetime) → epoch default.
    recipe = Recipe(
        "wp-users", "joomla_users",
        mappings=(
            Mapping(
                (ref("user_login"), ref("user_login"), ref("user_email"),
                 ref("user_registered"), ref("user_registered")),
                ("name", "username", "email", "registerdate",
                 "lastvisitdate"),
            ),
            Mapping(
                (ref("id"),), ("id",),
                transformers=(
                    ("if_then_else_numeric",
                     {"condition": "x>0", "then": "x=x+819", "format": "num"}),
                ),
            ),
            Mapping((ref("id"),), ("password",),
                    transformers=(("empty_string", {}),)),
            Mapping((ref("id"),), ("activation",),
                    transformers=(("empty_string", {}),)),
            Mapping((ref("id"),), ("params",),
                    transformers=(("empty_string", {}),)),
            Mapping(
                (ref("id"),), ("lastresettime",),
                transformers=(("overwrite", {"type": "datetime"}),),
            ),
            Mapping((ref("id"),), ("otpkey",),
                    transformers=(("empty_string", {}),)),
            Mapping((ref("id"),), ("otep",),
                    transformers=(("empty_string", {}),)),
            Mapping((ref("id"),), ("block",),
                    transformers=(("overwrite", {"value": "0", "type": "long"}),)),
            Mapping((ref("id"),), ("sendemail",),
                    transformers=(("overwrite", {"value": "0", "type": "long"}),)),
            Mapping((ref("id"),), ("resetcount",),
                    transformers=(("overwrite", {"value": "0", "type": "long"}),)),
            Mapping((ref("id"),), ("requirereset",),
                    transformers=(("overwrite", {"value": "0", "type": "long"}),)),
        ),
    )
    return Pipeline("wp2joomla-users", (src,), (tgt,), (recipe,))


@requires_fixtures
def test_wp_users_to_joomla_users_golden(spark, derby_url):
    jvm_execute(spark, derby_url, USERS_DDL, DRIVER)

    pipeline = _users_pipeline(derby_url)
    # Parser row count: 3 (WP2Joomla.scala:290-292).
    assert read_source(spark, pipeline.source("wp_users")).count() == 3

    run_pipeline(spark, pipeline)

    back = read_source(
        spark,
        SourceSpec(
            "JOOMLA_USERS", "jdbc", derby_url,
            options={"driver": DRIVER, "table": "JOOMLA_USERS"},
        ),
    ).orderBy("id")
    rows = back.collect()

    # Golden values: WP2Joomla.scala:303-324 — ids rebased 1.. → 820..
    assert [r["id"] for r in rows] == [820, 821, 822]
    assert [r["name"] for r in rows] == ["chris", "user2", "user3"]
    chris = rows[0]
    assert chris["username"] == "chris"
    assert chris["email"] == "christian@wegtam.com"
    assert chris["password"] == ""
    assert chris["block"] == 0
    assert chris["sendemail"] == 0
    assert chris["registerdate"] == datetime(2015, 7, 7, 9, 22, 31)
    assert chris["lastvisitdate"] == datetime(2015, 7, 7, 9, 22, 31)
    assert chris["activation"] == ""
    assert chris["params"] == ""
    assert chris["lastresettime"] == EPOCH
    assert chris["resetcount"] == 0
    assert chris["otpkey"] == ""
    assert chris["otep"] == ""
    assert chris["requirereset"] == 0


# --- wp_posts → joomla_content --------------------------------------------------

INTRO_1 = (
    "Willkommen zur deutschen Version von WordPress. Dies ist der erste"
    " Beitrag. Du kannst ihn bearbeiten oder löschen. Um Spam zu"
    " vermeiden, geh doch gleich mal in den Pluginbereich und aktiviere"
    " die entsprechenden Plugins. So, und nun genug geschwafelt – jetzt"
    " nichts wie ran ans Bloggen!"
)
CONTENT_2 = (
    "Dies ist ein Beispiel einer statischen Seite. Du kannst sie"
    " bearbeiten und beispielsweise Infos über dich oder das Weblog"
    " eingeben, damit die Leser wissen, woher du kommst und was du"
    " machst.\\n\\nDu kannst entweder beliebig viele Hauptseiten (wie"
    " diese hier) oder Unterseiten, die sich in der Hierachiestruktur"
    " den Hauptseiten unterordnen, anlegen. Du kannst sie auch alle"
    " innerhalb von WordPress ändern und verwalten.\\n\\nAls stolzer"
    " Besitzer eines neuen WordPress-Seite, solltest du zur"
    ' Übersichtsseite, dem <a href="http://localhost/wordpress/'
    'wp-admin/">Dashboard</a> gehen, diese Seite löschen und damit'
    " loslegen, eigene Inhalte zu erstellen. Viel Spaß!"
)

# Source rows from WP2Joomla.scala:340-377 — 11 rows of which 6 are
# 'revision' type; the DFASDL seq filter keeps only post/page.
POSTS_DDL = [
    "CREATE TABLE wp_posts (id BIGINT, post_author BIGINT,"
    " post_date TIMESTAMP, post_date_gmt TIMESTAMP,"
    " post_content VARCHAR(4000), post_title VARCHAR(255),"
    " post_excerpt VARCHAR(255), post_status VARCHAR(20),"
    " comment_status VARCHAR(20), ping_status VARCHAR(20),"
    " post_password VARCHAR(20), post_name VARCHAR(200),"
    " to_ping VARCHAR(255), pinged VARCHAR(255),"
    " post_modified TIMESTAMP, post_modified_gmt TIMESTAMP,"
    " post_content_filtered VARCHAR(255), post_parent BIGINT,"
    " guid VARCHAR(255), menu_order INTEGER, post_type VARCHAR(20),"
    " post_mime_type VARCHAR(100), comment_count BIGINT)",
    f"INSERT INTO wp_posts VALUES(1, 1, '2015-07-07 11:22:31',"
    f" '2015-07-07 09:22:31', '{INTRO_1}', 'Hallo Welt!', '', 'publish',"
    f" 'open', 'open', '', 'hallo-welt', '', '', '2015-07-24 12:13:00',"
    f" '2015-07-24 10:13:00', '', 0, 'http://localhost/wordpress/?p=1',"
    f" 0, 'post', '', 0)",
    f"INSERT INTO wp_posts VALUES(2, 1, '2015-07-07 11:22:31',"
    f" '2015-07-07 09:22:31', '{CONTENT_2}', 'Beispiel-Seite', '',"
    f" 'publish', 'open', 'open', '', 'beispiel-seite', '', '',"
    f" '2015-07-07 11:22:31', '2015-07-07 09:22:31', '', 0,"
    f" 'http://localhost/wordpress/?page_id=2', 0, 'page', '', 0)",
    "INSERT INTO wp_posts VALUES(4, 1, '2015-07-08 09:36:35',"
    " '2015-07-08 07:36:35', 'ednfjkfkdskndsklfe\\r\\n\\r\\n"
    "fknfsdnflkdsfklds', 'Testartikel', '', 'publish', 'open', 'open',"
    " '', 'testartikel', '', '', '2015-07-08 09:37:31',"
    " '2015-07-08 07:37:31', '', 0, 'http://localhost/wordpress/?p=4',"
    " 0, 'post', '', 0)",
    "INSERT INTO wp_posts VALUES(5, 1, '2015-07-08 09:36:35',"
    " '2015-07-08 07:36:35', 'ednfjkfkdskndsklfe', 'Testartikel', '',"
    " 'inherit', 'open', 'open', '', '4-revision-v1', '', '',"
    " '2015-07-08 09:36:35', '2015-07-08 07:36:35', '', 4,"
    " 'http://localhost/wordpress/index.php/2015/07/08/4-revision-v1/',"
    " 0, 'revision', '', 0)",
    "INSERT INTO wp_posts VALUES(6, 1, '2015-07-08 09:37:31',"
    " '2015-07-08 07:37:31', 'ednfjkfkdskndsklfe\\r\\n\\r\\n"
    "fknfsdnflkdsfklds', 'Testartikel', '', 'inherit', 'open', 'open',"
    " '', '4-revision-v1', '', '', '2015-07-08 09:37:31',"
    " '2015-07-08 07:37:31', '', 4,"
    " 'http://localhost/wordpress/index.php/2015/07/08/4-revision-v1/',"
    " 0, 'revision', '', 0)",
    "INSERT INTO wp_posts VALUES(7, 1, '2015-07-08 09:39:06',"
    " '2015-07-08 07:39:06', 'bla blubb', '2. Testartikel', '',"
    " 'publish', 'open', 'open', '', '2-testartikel', '', '',"
    " '2015-07-08 09:39:06', '2015-07-08 07:39:06', '', 0,"
    " 'http://localhost/wordpress/?p=7', 0, 'post', '', 0)",
    "INSERT INTO wp_posts VALUES(8, 1, '2015-07-08 09:39:06',"
    " '2015-07-08 07:39:06', 'bla blubb', '2. Testartikel', '',"
    " 'inherit', 'open', 'open', '', '7-revision-v1', '', '',"
    " '2015-07-08 09:39:06', '2015-07-08 07:39:06', '', 7,"
    " 'http://localhost/wordpress/index.php/2015/07/08/7-revision-v1/',"
    " 0, 'revision', '', 0)",
    "INSERT INTO wp_posts VALUES(9, 1, '2015-07-08 09:39:34',"
    " '2015-07-08 07:39:34', 'blubb bla', '3. Testartikel', '', 'draft',"
    " 'closed', 'closed', '', '3-testartikel', '', '',"
    " '2015-08-04 12:22:47', '2015-08-04 10:22:47', '', 0,"
    " 'http://localhost/wordpress/?p=9', 0, 'post', '', 3)",
    "INSERT INTO wp_posts VALUES(10, 1, '2015-07-08 09:39:34',"
    " '2015-07-08 07:39:34', 'blubb bla', '3. Testartikel', '',"
    " 'inherit', 'open', 'open', '', '9-revision-v1', '', '',"
    " '2015-07-08 09:39:34', '2015-07-08 07:39:34', '', 9,"
    " 'http://localhost/wordpress/index.php/2015/07/08/9-revision-v1/',"
    " 0, 'revision', '', 0)",
    "INSERT INTO wp_posts VALUES(12, 1, '2015-07-24 12:13:00',"
    f" '2015-07-24 10:13:00', '{INTRO_1}', 'Hallo Welt!', '', 'inherit',"
    " 'open', 'open', '', '1-revision-v1', '', '',"
    " '2015-07-24 12:13:00', '2015-07-24 10:13:00', '', 1,"
    " 'http://localhost/wordpress/index.php/2015/07/24/1-revision-v1/',"
    " 0, 'revision', '', 0)",
]


def _posts_pipeline(derby_url):
    src = source_spec(
        _dfasdl("source-wp_posts"), "wp_posts", derby_url, fmt="jdbc",
        seq_id="wp_posts",
    )
    src.options.update({"driver": DRIVER, "table": "wp_posts"})
    tgt = target_spec(
        _dfasdl("target-joomla_content"), "joomla_content", derby_url,
        fmt="jdbc", seq_id="joomla_content", mode="overwrite",
    )
    tgt.options.update({"driver": DRIVER, "table": "JOOMLA_CONTENT"})

    def ref(col):
        return ColumnRef("wp_posts", col)

    ow0 = ("overwrite", {"value": "0", "type": "long"})

    # ≙ Cookbook "Posts" (WP2Joomla.scala:396-647), mapping for mapping.
    recipe = Recipe(
        "wp-posts", "joomla_content",
        mappings=(
            Mapping(
                (ref("id"), ref("post_title"), ref("post_content"),
                 ref("post_date_gmt"), ref("post_modified_gmt"),
                 ref("post_date_gmt")),
                ("id", "title", "introtext", "created", "modified",
                 "publish_up"),
            ),
            Mapping(
                (ref("post_author"), ref("post_author")),
                ("created_by", "modified_by"),
                transformers=(
                    ("if_then_else_numeric",
                     {"condition": "x>0", "then": "x=x+819", "format": "num"}),
                ),
            ),
            Mapping((ref("id"),), ("asset_id",), transformers=(ow0,)),
            # The alias chain (WP2Joomla.scala:458-480): specials → '-',
            # squeeze repeated '-', strip leading/trailing '-'.
            Mapping(
                (ref("post_title"),), ("alias",),
                transformers=(
                    ("replace", {"search": ("\\.", "!", "\\?", "\\s+"),
                                 "replace": "-"}),
                    ("replace", {"search": ("-{2,}",), "replace": "-"}),
                    ("replace", {"search": ("^-", "-$"), "replace": ""}),
                ),
            ),
            # state: publish → 1; draft/inherit/auto-draft → 0
            # (WP2Joomla.scala:481-498).
            Mapping(
                (ref("post_status"),), ("state",),
                transformers=(
                    ("replace", {"search": ("publish",), "replace": "1"}),
                    ("replace",
                     {"search": ("draft", "inherit", "auto-draft"),
                      "replace": "0"}),
                ),
            ),
            Mapping((ref("id"),), ("catid",),
                    transformers=(("overwrite", {"value": "2", "type": "long"}),)),
            Mapping((ref("id"),), ("version",),
                    transformers=(("overwrite", {"value": "1", "type": "long"}),)),
            Mapping((ref("id"),), ("ordering",), transformers=(ow0,)),
            Mapping((ref("id"),), ("access",),
                    transformers=(("overwrite", {"value": "1", "type": "long"}),)),
            Mapping((ref("id"),), ("hits",), transformers=(ow0,)),
            Mapping((ref("id"),), ("featured",),
                    transformers=(("overwrite", {"value": "1", "type": "long"}),)),
            Mapping((ref("id"),), ("language",),
                    transformers=(("overwrite", {"value": "*", "type": "string"}),)),
            Mapping(
                (ref("id"),) * 5,
                ("fulltext", "created_by_alias", "metakey", "metadesc",
                 "xreference"),
                transformers=(("empty_string", {}),),
            ),
            Mapping(
                (ref("id"),) * 2,
                ("checked_out_time", "publish_down"),
                transformers=(("overwrite", {"type": "datetime"}),),
            ),
            Mapping((ref("id"),), ("checked_out",), transformers=(ow0,)),
            Mapping(
                (ref("id"),) * 4,
                ("images", "urls", "attribs", "metadata"),
                transformers=(("overwrite", {"value": "{}", "type": "string"}),),
            ),
        ),
    )
    return Pipeline("wp2joomla-posts", (src,), (tgt,), (recipe,))


@requires_fixtures
def test_wp_posts_to_joomla_content_golden(spark, derby_url):
    jvm_execute(spark, derby_url, POSTS_DDL, DRIVER)

    pipeline = _posts_pipeline(derby_url)
    # Parser row count: 5 (WP2Joomla.scala:670-672) — the seq filter
    # "post_type = 'post' OR post_type = 'page'" drops the 6 revisions.
    assert read_source(spark, pipeline.source("wp_posts")).count() == 5

    run_pipeline(spark, pipeline)

    back = read_source(
        spark,
        SourceSpec(
            "JOOMLA_CONTENT", "jdbc", derby_url,
            options={"driver": DRIVER, "table": "JOOMLA_CONTENT"},
        ),
    ).orderBy("id")
    rows = back.collect()

    # Golden values: WP2Joomla.scala:682-725.
    assert [r["id"] for r in rows] == [1, 2, 4, 7, 9]
    first = rows[0]
    assert first["asset_id"] == 0
    assert first["title"] == "Hallo Welt!"
    assert first["alias"] == "Hallo-Welt"
    assert first["introtext"] == INTRO_1
    assert first["fulltext"] == ""
    assert first["state"] == 1
    assert first["catid"] == 2
    assert first["created"] == datetime(2015, 7, 7, 9, 22, 31)
    assert first["created_by"] == 820
    assert first["created_by_alias"] == ""
    assert first["modified"] == datetime(2015, 7, 24, 10, 13, 0)
    assert first["modified_by"] == 820
    assert first["checked_out"] == 0
    assert first["checked_out_time"] == EPOCH
    assert first["publish_up"] == datetime(2015, 7, 7, 9, 22, 31)
    assert first["publish_down"] == EPOCH
    assert first["images"] == "{}"
    assert first["urls"] == "{}"
    assert first["attribs"] == "{}"
    assert first["version"] == 1
    assert first["ordering"] == 0
    assert first["metakey"] == ""
    assert first["metadesc"] == ""
    assert first["access"] == 1
    assert first["hits"] == 0
    assert first["metadata"] == "{}"
    assert first["featured"] == 1
    assert first["language"] == "*"
    assert first["xreference"] == ""
    # The draft row keeps state 0 (WP2Joomla.scala:723-724).
    assert rows[4]["state"] == 0


# --- wp_comments → joomla_jcomments ----------------------------------------------

COMMENT_1 = (
    "Hi, das ist ein Kommentar.\\nUm einen Kommentar zu löschen, melde"
    " dich einfach an und betrachte die Beitrags-Kommentare. Dort hast"
    " du die Möglichkeit sie zu löschen oder zu bearbeiten. "
)
FIREFOX_38 = (
    "Mozilla/5.0 (X11; Ubuntu; Linux x86_64; rv:38.0)"
    " Gecko/20100101 Firefox/38.0"
)
FIREFOX_39 = FIREFOX_38.replace("38.0", "39.0")

# Source rows from WP2Joomla.scala:736-762.
COMMENTS_DDL = [
    "CREATE TABLE wp_comments (comment_id BIGINT, comment_post_id BIGINT,"
    " comment_author VARCHAR(255), comment_author_email VARCHAR(100),"
    " comment_author_url VARCHAR(200), comment_author_ip VARCHAR(100),"
    " comment_date TIMESTAMP, comment_date_gmt TIMESTAMP,"
    " comment_content VARCHAR(2000), comment_karma INTEGER,"
    " comment_approved VARCHAR(20), comment_agent VARCHAR(255),"
    " comment_type VARCHAR(20), comment_parent BIGINT, user_id BIGINT)",
    f"INSERT INTO wp_comments VALUES (1, 1, 'Mr WordPress', '',"
    f" 'https://wordpress.org/', '', '2015-07-07 11:22:31',"
    f" '2015-07-07 09:22:31', '{COMMENT_1}', 0, '1', '', '', 0, 0)",
    f"INSERT INTO wp_comments VALUES (2, 9, 'chris',"
    f" 'christian_tessnow@yahoo.de', '', '127.0.0.1',"
    f" '2015-07-08 09:44:09', '2015-07-08 07:44:09', 'cooler artikel',"
    f" 0, '1', '{FIREFOX_38}', '', 0, 1)",
    f"INSERT INTO wp_comments VALUES (3, 9, 'chris',"
    f" 'christian_tessnow@yahoo.de', '', '127.0.0.1',"
    f" '2015-07-08 09:44:34', '2015-07-08 07:44:34',"
    f" 'hier kommentiert der admin noch selbst', 0, '1',"
    f" '{FIREFOX_38}', '', 0, 1)",
    f"INSERT INTO wp_comments VALUES (4, 9, 'user2', 'a@b.de', '',"
    f" '127.0.0.1', '2015-07-08 09:45:56', '2015-07-08 07:45:56',"
    f" 'user comment', 0, '1', '{FIREFOX_38}', '', 0, 2)",
    f"INSERT INTO wp_comments VALUES (5, 1, 'user2', 'a@b.de', '',"
    f" '127.0.0.1', '2015-07-08 09:49:03', '2015-07-08 07:49:03',"
    f" '[quote name=\"Christian\"]1. Kommentar[/quote]<br />"
    f"Antwortkommentar', 0, '1', '{FIREFOX_38}', '', 0, 2)",
    f"INSERT INTO wp_comments VALUES (6, 1, 'chris',"
    f" 'christian_tessnow@yahoo.de', '', '127.0.0.1',"
    f" '2015-07-24 12:33:05', '2015-07-24 10:33:05', 'REPLY', 0, '1',"
    f" '{FIREFOX_39}', '', 1, 1)",
    f"INSERT INTO wp_comments VALUES (7, 1, 'chris', 'c@t.de', '',"
    f" '127.0.0.1', '2015-07-27 09:32:36', '2015-07-27 07:32:36',"
    f" 'Antwort2', 0, '1', '{FIREFOX_39}', '', 1, 0)",
    f"INSERT INTO wp_comments VALUES (8, 1, 'chris', 'c@t.de', '',"
    f" '127.0.0.1', '2015-07-27 09:32:52', '2015-07-27 07:32:52',"
    f" 'REPLY2', 0, '1', '{FIREFOX_39}', '', 6, 0)",
]


def _comments_pipeline(derby_url):
    src = source_spec(
        _dfasdl("source-wp_comments"), "wp_comments", derby_url, fmt="jdbc",
        seq_id="wp_comments",
    )
    src.options.update({"driver": DRIVER, "table": "wp_comments"})
    tgt = target_spec(
        _dfasdl("target-joomla_jcomments"), "joomla_jcomments", derby_url,
        fmt="jdbc", seq_id="joomla_jcomments", mode="overwrite",
    )
    tgt.options.update({"driver": DRIVER, "table": "JOOMLA_JCOMMENTS"})

    def ref(col):
        return ColumnRef("wp_comments", col)

    ow0 = ("overwrite", {"value": "0", "type": "long"})

    # ≙ Cookbook "Comments" (WP2Joomla.scala:778-927), mapping for
    # mapping: one aggregated 11→11 MapOneToOne (author drives BOTH
    # name and username; approved '1' string lands in the num published
    # column via target-type coercion), a 9-wide zero Overwrite, and
    # constants for path/object_group/lang/checked_out_time.
    recipe = Recipe(
        "wp-comments", "joomla_jcomments",
        mappings=(
            Mapping(
                (ref("comment_id"), ref("comment_post_id"), ref("user_id"),
                 ref("comment_author"), ref("comment_author"),
                 ref("comment_author_email"), ref("comment_author_url"),
                 ref("comment_content"), ref("comment_author_ip"),
                 ref("comment_date_gmt"), ref("comment_approved")),
                ("id", "object_id", "userid", "name", "username", "email",
                 "homepage", "comment", "ip", "date", "published"),
            ),
            Mapping(
                (ref("comment_id"),) * 9,
                ("parent", "thread_id", "level", "isgood", "ispoor",
                 "deleted", "subscribe", "source_id", "checked_out"),
                transformers=(ow0,),
            ),
            Mapping((ref("comment_id"),), ("path",),
                    transformers=(("overwrite", {"value": "0", "type": "string"}),)),
            Mapping((ref("comment_id"),), ("object_group",),
                    transformers=(("overwrite",
                                   {"value": "com_content", "type": "string"}),)),
            Mapping(
                (ref("comment_id"),) * 4,
                ("object_params", "title", "source", "editor"),
                transformers=(("empty_string", {}),),
            ),
            Mapping((ref("comment_id"),), ("lang",),
                    transformers=(("overwrite",
                                   {"value": "de-DE", "type": "string"}),)),
            Mapping(
                (ref("comment_id"),), ("checked_out_time",),
                transformers=(("overwrite",
                               {"value": "1970-01-01 00:00:00",
                                "type": "datetime"}),),
            ),
        ),
    )
    return Pipeline("wp2joomla-comments", (src,), (tgt,), (recipe,))


@requires_fixtures
def test_wp_comments_to_joomla_jcomments_golden(spark, derby_url):
    jvm_execute(spark, derby_url, COMMENTS_DDL, DRIVER)

    pipeline = _comments_pipeline(derby_url)
    # Parser row count: 8 (WP2Joomla.scala:950-952).
    assert read_source(spark, pipeline.source("wp_comments")).count() == 8

    run_pipeline(spark, pipeline)

    back = read_source(
        spark,
        SourceSpec(
            "JOOMLA_JCOMMENTS", "jdbc", derby_url,
            options={"driver": DRIVER, "table": "JOOMLA_JCOMMENTS"},
        ),
    ).orderBy("id")
    rows = back.collect()

    # Golden values: WP2Joomla.scala:962-1008.
    assert [r["id"] for r in rows] == [1, 2, 3, 4, 5, 6, 7, 8]
    first = rows[0]
    assert first["parent"] == 0
    assert first["thread_id"] == 0
    assert first["path"] == "0"
    assert first["level"] == 0
    assert first["object_id"] == 1
    assert first["object_group"] == "com_content"
    assert first["object_params"] == ""
    assert first["lang"] == "de-DE"
    assert first["userid"] == 0
    assert first["name"] == "Mr WordPress"
    assert first["username"] == "Mr WordPress"
    assert first["email"] == ""
    assert first["homepage"] == "https://wordpress.org/"
    assert first["title"] == ""
    assert first["comment"] == COMMENT_1
    assert first["ip"] == ""
    assert first["date"] == datetime(2015, 7, 7, 9, 22, 31)
    assert first["isgood"] == 0
    assert first["ispoor"] == 0
    assert first["published"] == 1
    assert first["deleted"] == 0
    assert first["subscribe"] == 0
    assert first["source"] == ""
    assert first["source_id"] == 0
    assert first["checked_out"] == 0
    assert first["checked_out_time"] == EPOCH
    assert first["editor"] == ""
