"""WSGI entry point for production servers (uwsgi/gunicorn).

Parity target: the reference's ``wsgi.py`` + ``digipathai.ini`` uwsgi deploy
(``reference wsgi.py:1-6``, ``reference digipathai.ini:1-12``).  Configure
via environment:

    DPAI_SLIDE_DIR     slide directory (default '.')
    DPAI_VIEWER_ONLY   '1' (default) to disable segmentation

Example: ``uwsgi --ini deploy/digipathai.ini``
"""

import os

from digipathai_tpu.server.app import ServerConfig, create_app

application = create_app(ServerConfig(
    slide_dir=os.environ.get("DPAI_SLIDE_DIR", "."),
    viewer_only=os.environ.get("DPAI_VIEWER_ONLY", "1") != "0",
))
