#!/bin/sh
# Install the tracked git hooks into .git/hooks (idempotent).
cd "$(dirname "$0")/.." || exit 1
cp dev/hooks/pre-commit .git/hooks/pre-commit
chmod +x .git/hooks/pre-commit
echo "installed pre-commit compile guard"
