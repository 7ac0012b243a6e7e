"""Network staging layer (≙ parsers/NetworkFileParser.scala).

The reference streams remote files over HTTP/HTTPS/FTP(S)/SFTP — gzip
aware — and then tokenizes them exactly like local files
(``NetworkFileParser.scala:128-256``). Spark has no native readers for
these schemes (S3/HDFS/ABFS URIs *are* native and pass through), so we
stage the remote object to a local temp file first and hand the local
path to the normal reader. The fetch is a pre-flight, driver-side step —
the actual parse stays fully distributed.

SFTP needs ``paramiko`` which is not a baked-in dependency; it is gated
behind an import-try and raises a clear error when absent.
"""

from __future__ import annotations

import gzip
import os
import shutil
import tempfile
import urllib.parse
import urllib.request

# Schemes Spark (or the local FS) reads natively — no staging.
# "jdbc" passes through too: the JDBC reader connects itself.
_NATIVE = {"", "file", "hdfs", "s3", "s3a", "s3n", "abfs", "abfss", "gs", "wasb", "wasbs", "dbfs", "jdbc"}


def stage_uri(uri: str, cache_dir: str | None = None) -> str:
    """Return a locally readable path for *uri*, fetching if remote.

    gzip payloads (by extension) are decompressed during staging, like
    the reference's gzip-aware stream (``NetworkFileParser.scala:214``).
    """
    scheme = urllib.parse.urlparse(uri).scheme.lower()
    if scheme in _NATIVE:
        return uri
    if scheme in ("http", "https", "ftp"):
        return _stage_url(uri, cache_dir)
    if scheme == "ftps":
        # FTPS is FTP-over-TLS, NOT SSH: stdlib ftplib.FTP_TLS, never
        # paramiko (an SSH client cannot speak to an FTPS endpoint).
        return _stage_ftps(uri, cache_dir)
    if scheme == "sftp":
        return _stage_sftp(uri, cache_dir)
    if scheme == "smb":
        # The reference's URI helper recognizes smb
        # (``helpers/URIHelpers.scala:28-33``) but ships no SMB client
        # either; same error contract as the sftp gate.
        raise NotImplementedError(
            "SMB staging requires an SMB client dependency (e.g. smbprotocol); "
            "mount the share and use a file:// path, or stage the file to a "
            "local/object-store path"
        )
    raise ValueError(f"unsupported URI scheme {scheme!r} for {uri!r}")


def _dest_path(uri: str, cache_dir: str | None) -> str:
    base = os.path.basename(urllib.parse.urlparse(uri).path) or "staged"
    if base.endswith(".gz"):
        base = base[:-3]
    d = cache_dir or tempfile.mkdtemp(prefix="tensei_net_")
    os.makedirs(d, exist_ok=True)
    return os.path.join(d, base)


def _maybe_gunzip(uri: str, dest: str) -> None:
    """Decompress a just-staged ``.gz`` payload in place.

    ``_dest_path`` strips the ``.gz`` suffix from the staged NAME for
    every scheme, so any fetcher that lands raw bytes (FTPS, SFTP —
    their protocols hand over files whole, unlike the HTTP path's
    streaming GzipFile) must decompress afterwards or the reader gets
    compressed bytes under an uncompressed name.
    """
    if not urllib.parse.urlparse(uri).path.endswith(".gz"):
        return
    tmp = dest + ".gz.tmp"
    os.replace(dest, tmp)
    try:
        with gzip.open(tmp, "rb") as src, open(dest, "wb") as out:
            shutil.copyfileobj(src, out)
    finally:
        os.remove(tmp)


def _stage_url(uri: str, cache_dir: str | None) -> str:
    dest = _dest_path(uri, cache_dir)
    gz = urllib.parse.urlparse(uri).path.endswith(".gz")
    with urllib.request.urlopen(uri) as resp:  # noqa: S310 - explicit staging
        src = gzip.GzipFile(fileobj=resp) if gz else resp
        with open(dest, "wb") as out:
            shutil.copyfileobj(src, out)
    return dest


def push_file(local_path: str, uri: str) -> None:
    """Push a locally written file to a remote target
    (≙ writers/NetworkFileWriterActor.scala:103-412, FTP/FTPS/SFTP).

    Driver-side post-write staging: the distributed write lands locally
    (or on an object store), then one upload moves it. Native schemes
    are a plain copy.
    """
    parsed = urllib.parse.urlparse(uri)
    scheme = parsed.scheme.lower()
    if scheme in _NATIVE:
        dest = parsed.path if scheme == "file" else uri
        if os.path.abspath(dest) != os.path.abspath(local_path):
            shutil.copyfile(local_path, dest)
        return
    if scheme == "ftp":
        import ftplib

        ftp = ftplib.FTP()
        ftp.connect(parsed.hostname, parsed.port or 21)
        ftp.login(parsed.username or "anonymous", parsed.password or "")
        try:
            with open(local_path, "rb") as fh:
                ftp.storbinary(f"STOR {parsed.path}", fh)
        finally:
            ftp.quit()
        return
    if scheme == "ftps":
        import ftplib

        ftp = ftplib.FTP_TLS()
        ftp.connect(parsed.hostname, parsed.port or 21)
        ftp.login(parsed.username or "anonymous", parsed.password or "")
        ftp.prot_p()  # encrypt the data channel too
        try:
            with open(local_path, "rb") as fh:
                ftp.storbinary(f"STOR {parsed.path}", fh)
        finally:
            ftp.quit()
        return
    if scheme == "sftp":
        try:
            import paramiko
        except ImportError as e:  # pragma: no cover - env without paramiko
            raise NotImplementedError(
                "SFTP push requires the optional 'paramiko' dependency"
            ) from e
        transport = paramiko.Transport((parsed.hostname, parsed.port or 22))
        transport.connect(username=parsed.username, password=parsed.password)
        try:
            paramiko.SFTPClient.from_transport(transport).put(local_path, parsed.path)
        finally:
            transport.close()
        return
    raise ValueError(f"unsupported push scheme {scheme!r} for {uri!r}")


def _stage_ftps(uri: str, cache_dir: str | None) -> str:
    """FTP-over-TLS fetch via stdlib ftplib.FTP_TLS (explicit mode,
    PROT P data channel)."""
    import ftplib

    parsed = urllib.parse.urlparse(uri)
    ftp = ftplib.FTP_TLS()
    ftp.connect(parsed.hostname, parsed.port or 21)
    ftp.login(parsed.username or "anonymous", parsed.password or "")
    ftp.prot_p()
    dest = _dest_path(uri, cache_dir)
    try:
        with open(dest, "wb") as out:
            ftp.retrbinary(f"RETR {parsed.path}", out.write)
    finally:
        ftp.quit()
    _maybe_gunzip(uri, dest)
    return dest


def _stage_sftp(uri: str, cache_dir: str | None) -> str:
    try:
        import paramiko  # noqa: F401
    except ImportError as e:  # pragma: no cover - env without paramiko
        raise NotImplementedError(
            "SFTP staging requires the optional 'paramiko' dependency; "
            "install it or stage the file to a local/object-store path"
        ) from e
    parsed = urllib.parse.urlparse(uri)
    transport = paramiko.Transport((parsed.hostname, parsed.port or 22))
    transport.connect(username=parsed.username, password=parsed.password)
    try:
        sftp = paramiko.SFTPClient.from_transport(transport)
        dest = _dest_path(uri, cache_dir)
        sftp.get(parsed.path, dest)
    finally:
        transport.close()
    _maybe_gunzip(uri, dest)
    return dest
