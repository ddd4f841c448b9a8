"""Config system: TOML file + CLI-style overrides.

Mirrors the reference's config surface (``/root/reference/src/config/mod.rs``
``GeneralConfig`` fields + defaults ``:26-115``; load/save ``:149-163``) and
its CLI override-merge rules (``/root/reference/src/main.rs:21-59``):
max_file_size / include_hidden / follow_symlinks / respect_gitignore are
straight overrides, ``extensions`` REPLACES the configured list, and
``exclude`` patterns are APPENDED (deduplicated).

One naming deviation, documented: the reference's flag is
``ignore_gitignore`` with the inverted meaning "DO honor .gitignore" (it is
passed straight to ``WalkBuilder::git_ignore``, ``crawler/mod.rs:51``); here
it is called ``respect_gitignore`` with the same default (True) and the TOML
key ``ignore_gitignore`` is still accepted for file-level parity.
"""

from __future__ import annotations

import dataclasses
import os
import tomllib

# Reference defaults (config/mod.rs:26-115). Extension list abridged to the
# same families; exclude patterns identical.
DEFAULT_EXTENSIONS = (
    "rs py js ts jsx tsx go java kt scala c cpp cc cxx h hpp cs rb php swift "
    "dart lua pl sh bash zsh fish ps1 bat r jl hs elm clj ex erl vim asm s "
    "html htm css scss sass less vue svelte json yaml yml toml xml ini cfg "
    "conf properties env md markdown txt rst adoc asciidoc tex rtf sql "
    "graphql gql log csv tsv"
).split()
DEFAULT_EXCLUDE = [".git", "target", "node_modules", ".cache", "*.tmp",
                   "*.log"]


@dataclasses.dataclass
class GeneralConfig:
    max_file_size: int = 10_485_760
    file_extensions: list[str] = dataclasses.field(
        default_factory=lambda: list(DEFAULT_EXTENSIONS))
    exclude_patterns: list[str] = dataclasses.field(
        default_factory=lambda: list(DEFAULT_EXCLUDE))
    follow_symlinks: bool = False
    include_hidden: bool = False
    respect_gitignore: bool = True

    def crawl_kwargs(self) -> dict:
        """kwargs for :func:`sema_ray.pipelines.search.crawl`."""
        return {
            "extensions": tuple(self.file_extensions),
            "max_file_size": self.max_file_size,
            "include_hidden": self.include_hidden,
            "follow_symlinks": self.follow_symlinks,
            "exclude_patterns": tuple(self.exclude_patterns),
            "respect_gitignore": self.respect_gitignore,
        }


def load_config(path: str | None = None) -> GeneralConfig:
    """Load ``[general]`` from a TOML file; missing file -> defaults."""
    cfg = GeneralConfig()
    if path is None or not os.path.exists(path):
        return cfg
    with open(path, "rb") as f:
        data = tomllib.load(f)
    gen = data.get("general", data)
    for key in ("max_file_size", "file_extensions", "exclude_patterns",
                "follow_symlinks", "include_hidden"):
        if key in gen:
            setattr(cfg, key, gen[key])
    if "respect_gitignore" in gen:
        cfg.respect_gitignore = bool(gen["respect_gitignore"])
    elif "ignore_gitignore" in gen:  # reference TOML key, same meaning
        cfg.respect_gitignore = bool(gen["ignore_gitignore"])
    return cfg


def apply_overrides(cfg: GeneralConfig, *,
                    max_file_size: int | None = None,
                    include_hidden: bool = False,
                    follow_symlinks: bool = False,
                    respect_gitignore: bool = False,
                    extensions: list[str] | None = None,
                    exclude: list[str] | None = None) -> GeneralConfig:
    """CLI merge semantics of ``main.rs:31-59`` (flags only turn things ON;
    extensions replace; excludes append-dedup)."""
    if max_file_size is not None:
        cfg.max_file_size = max_file_size
    if include_hidden:
        cfg.include_hidden = True
    if follow_symlinks:
        cfg.follow_symlinks = True
    if respect_gitignore:
        cfg.respect_gitignore = True
    if extensions is not None:
        cfg.file_extensions = list(extensions)
    if exclude:
        for pat in exclude:
            if pat not in cfg.exclude_patterns:
                cfg.exclude_patterns.append(pat)
    return cfg
