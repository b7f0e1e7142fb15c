"""Download phase: YAML-manifest fetch with cache skip.

Parity with the reference's driver-side download phase (run.py:19-41 ->
eco_kg/utils/download_utils.py:13-51): the manifest is a YAML LIST of
items, each with

    url: https://...          (required; item skipped with a warning if
                               missing, download_utils.py:28-30)
    local_name: file.tsv.gz   (optional; default = last URL path segment,
                               download_utils.py:31-36)

Files already present in output_dir are skipped unless ignore_cache=True,
in which case the cached file is deleted and re-fetched
(download_utils.py:40-46). This is deliberately DRIVER-side, not a Spark
job: the reference fetches a handful of source archives once before the
distributed phases run, and a parallel fetch of N small HTTP files gains
nothing from an executor fleet (the transform phase then reads the
downloaded files distributed).

The fetcher is injectable so tests never touch the network (the reference
mocks downloads the same way, tests/resources/mock_download.py): pass
``fetcher=lambda url: bytes`` and the default urllib path is never used.
"""

from __future__ import annotations

import logging
import os
from typing import Callable

log = logging.getLogger(__name__)


def _default_fetcher(url: str) -> bytes:
    """urllib fetch with a browser User-Agent (the reference sends one,
    download_utils.py:48 — some source hosts reject the default UA)."""
    from urllib.request import Request, urlopen

    req = Request(url, headers={"User-Agent": "Mozilla/5.0"})
    with urlopen(req) as response:
        return response.read()


def download_from_yaml(
    yaml_file: str,
    output_dir: str,
    ignore_cache: bool = False,
    fetcher: Callable[[str], bytes] | None = None,
) -> list[str]:
    """Fetch every manifest item into output_dir; returns the paths
    written or cache-skipped (in manifest order). Items without a `url`
    key are skipped with a warning, matching the reference."""
    import yaml

    with open(yaml_file) as f:
        manifest = yaml.safe_load(f) or []
    return download_from_manifest(manifest, output_dir,
                                  ignore_cache=ignore_cache, fetcher=fetcher)


def download_from_manifest(
    manifest: list[dict],
    output_dir: str,
    ignore_cache: bool = False,
    fetcher: Callable[[str], bytes] | None = None,
) -> list[str]:
    fetch = fetcher or _default_fetcher
    os.makedirs(output_dir, exist_ok=True)
    out_paths: list[str] = []
    for item in manifest:
        if not isinstance(item, dict) or "url" not in item:
            log.warning("Couldn't find url for source in %s", item)
            continue
        url = item["url"]
        outfile = os.path.join(
            output_dir, item.get("local_name") or url.split("/")[-1])
        if os.path.exists(outfile):
            if ignore_cache:
                log.info("Deleting cached version of %s", outfile)
                os.remove(outfile)
            else:
                log.info("Using cached version of %s", outfile)
                out_paths.append(outfile)
                continue
        log.info("Retrieving %s from %s", outfile, url)
        data = fetch(url)
        # write-then-rename: an interrupted run must not leave a
        # truncated file at the final path, or the next run's cache check
        # would trust it and feed a partial download into the transforms
        tmp = outfile + ".part"
        with open(tmp, "wb") as out:
            out.write(data)
        os.replace(tmp, outfile)
        out_paths.append(outfile)
    return out_paths
