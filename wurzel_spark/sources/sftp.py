"""SFTP markdown source (SURVEY §2.1; reference SFTPManualMarkdownStep,
wurzel/steps/sftp/sftp_manual_markdown.py:41-227).

The reference syncs a remote SFTP directory to local staging, then runs the
ManualMarkdownStep parse over it. Same shape here: a client (paramiko when
installed, injectable test double otherwise) mirrors ``remote_dir`` into a
staging dir on the DRIVER, then ``read_markdown_folder`` — a fully
distributed Spark read — parses the staged files.

Why driver-side sync: SFTP is a single-connection, stateful protocol — the
listing must come from one place. The heavy part (parse + downstream
operators) is distributed; at real scale you'd mount the SFTP tree onto
shared storage (the reference's mount mode, sftp_manual_markdown.py:40)
and point Spark straight at it, which `read_markdown_folder(path)` already
supports.
"""

from __future__ import annotations

import os
import posixpath
import shutil
from collections.abc import Iterable

from pyspark.sql import DataFrame, SparkSession

from wurzel_spark.sources.markdown import read_markdown_folder

try:  # pragma: no cover - not installed in this container
    import paramiko  # type: ignore

    HAS_PARAMIKO = True
except ImportError:
    HAS_PARAMIKO = False


class SFTPClientProtocol:
    """Minimal client surface (list + fetch). ParamikoClient implements it
    against a real server; LocalDirClient is the offline double."""

    def listdir(self, path: str) -> Iterable[tuple[str, bool]]:
        """Yield (name, is_dir) for entries of ``path``."""
        raise NotImplementedError

    def get(self, remote_path: str, local_path: str) -> None:
        raise NotImplementedError

    def close(self) -> None:  # pragma: no cover - trivial
        pass


class ParamikoClient(SFTPClientProtocol):  # pragma: no cover - needs server
    """Password/key auth per sftp_manual_markdown.py:80-88."""

    def __init__(self, host: str, port: int = 22, username: str = "", password: str | None = None, key_filename: str | None = None):
        if not HAS_PARAMIKO:
            raise NotImplementedError("paramiko is not installed in this container")
        self._ssh = paramiko.SSHClient()
        self._ssh.set_missing_host_key_policy(paramiko.AutoAddPolicy())
        self._ssh.connect(host, port=port, username=username, password=password, key_filename=key_filename)
        self._sftp = self._ssh.open_sftp()

    def listdir(self, path: str):
        import stat as _stat

        for attr in self._sftp.listdir_attr(path):
            yield attr.filename, _stat.S_ISDIR(attr.st_mode)

    def get(self, remote_path: str, local_path: str) -> None:
        self._sftp.get(remote_path, local_path)

    def close(self) -> None:
        self._sftp.close()
        self._ssh.close()


class LocalDirClient(SFTPClientProtocol):
    """Offline double: 'remote' is a local directory tree."""

    def __init__(self, root: str):
        self.root = root

    def listdir(self, path: str):
        full = os.path.join(self.root, path.lstrip("/"))
        for name in sorted(os.listdir(full)):
            yield name, os.path.isdir(os.path.join(full, name))

    def get(self, remote_path: str, local_path: str) -> None:
        shutil.copyfile(os.path.join(self.root, remote_path.lstrip("/")), local_path)


def sync_tree(
    client: SFTPClientProtocol,
    remote_dir: str,
    staging_dir: str,
    glob_suffix: str = ".md",
    recursive: bool = True,
) -> int:
    """Mirror remote .md files into staging (recursion flag per
    sftp_manual_markdown.py:40). Returns files copied."""
    os.makedirs(staging_dir, exist_ok=True)
    copied = 0
    for name, is_dir in client.listdir(remote_dir):
        remote_path = posixpath.join(remote_dir, name)
        if is_dir:
            if recursive:
                copied += sync_tree(
                    client, remote_path, os.path.join(staging_dir, name), glob_suffix, recursive
                )
        elif name.endswith(glob_suffix):
            client.get(remote_path, os.path.join(staging_dir, name))
            copied += 1
    return copied


def read_sftp_markdown(
    spark: SparkSession,
    client: SFTPClientProtocol,
    remote_dir: str,
    staging_dir: str,
    url_prefix: str = "",
    recursive: bool = True,
) -> DataFrame:
    """Sync then parse — output schema is MarkdownDataContract, identical to
    the local-folder source."""
    sync_tree(client, remote_dir, staging_dir, recursive=recursive)
    return read_markdown_folder(spark, staging_dir, url_prefix=url_prefix)
