"""Local browser GUI for trained scenes (see viewer.html)."""

from pathlib import Path

VIEWER_HTML = Path(__file__).parent / "viewer.html"
