"""Every VOConfig field must be wired — read somewhere outside config.py.

Round-1 and round-2 reviews both found config fields that documented behavior the
code didn't implement (``ba.damping``, ``ba.max_points``, ``detector.max_corners``).
This test makes the anti-pattern structural: it introspects the full dataclass tree
and asserts each leaf field name is referenced (attribute access or keyword) in the
package sources. SURVEY §5: "every hard-coded constant … becomes a named field" —
and nothing else.
"""

from __future__ import annotations

import dataclasses
import pathlib
import re

from lcvo_tpu.config import VOConfig

PKG = pathlib.Path(__file__).resolve().parent.parent / "lcvo_tpu"


def _leaf_field_names(cls) -> set[str]:
    names = set()
    for f in dataclasses.fields(cls):
        sub = f.type if dataclasses.is_dataclass(f.type) else None
        default = f.default_factory() if f.default_factory is not dataclasses.MISSING else f.default
        if dataclasses.is_dataclass(default):
            names |= _leaf_field_names(type(default))
        else:
            names.add(f.name)
    return names


def test_every_config_field_is_read_outside_config_py():
    sources = ""
    for p in PKG.rglob("*.py"):
        if p.name == "config.py":
            continue
        sources += p.read_text()

    unused = []
    for name in sorted(_leaf_field_names(VOConfig)):
        # attribute read (cfg.x / det.x), keyword use, or dict key ("x": …)
        pat = rf"(\.{name}\b|\b{name}\s*=|[\"']{name}[\"'])"
        if not re.search(pat, sources):
            unused.append(name)
    assert not unused, f"config fields never read outside config.py: {unused}"
