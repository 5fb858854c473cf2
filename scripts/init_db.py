#!/usr/bin/env python
"""Database bootstrap CLI (reference: scripts/init_db.py:211-289).

  python scripts/init_db.py          create tables + seed templates
  python scripts/init_db.py --check  connectivity check only
  python scripts/init_db.py --reset  drop + recreate + seed
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--check", action="store_true")
    p.add_argument("--reset", action="store_true")
    args = p.parse_args()

    from ocr_system_tpu.core.config import get_settings
    from ocr_system_tpu.db.connection import Database
    from ocr_system_tpu.db.crud import Repositories, seed_templates
    from ocr_system_tpu.db.migrations import migrate

    settings = get_settings()
    db = Database(settings.db_path)

    if args.check:
        ok = db.check_connection()
        print(f"database {settings.db_path}: {'ok' if ok else 'FAILED'}")
        return 0 if ok else 1

    if args.reset:
        print("dropping all tables...")
        db.drop_tables()
        db.create_tables()

    applied = migrate(db)
    if applied:
        print(f"applied migrations: {applied}")
    repos = Repositories(db)
    n = seed_templates(repos)
    print(
        f"database ready at {settings.db_path} "
        f"({n} templates seeded, {len(repos.templates.list_active())} active)"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
