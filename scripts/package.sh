#!/bin/sh
# Release packaging — the reference's scripts/package_tool.sh analog
# (cmake+cpack there; sdist/wheel here). Run from the repo root.
set -e
python -m pip wheel --no-deps --no-build-isolation -w dist .
ls -l dist/
