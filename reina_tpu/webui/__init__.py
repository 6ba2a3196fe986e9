"""Interactive web UI (reference: corona.py Dash app + components/).

A dependency-free single-page app served next to the GraphQL endpoint:
scenario selector, intervention table editor, run button, streamed
result charts (epidemic curves, healthcare capacity, validation overlay
against observed data) rendered as inline SVG. State lives in the same
signed session cookie the GraphQL API uses, so edits made in the UI and
via the API are one world — like the reference's shared Flask session.
"""
import os

APP_HTML_PATH = os.path.join(os.path.dirname(__file__), "app.html")


def app_html() -> bytes:
    with open(APP_HTML_PATH, "rb") as f:
        return f.read()
