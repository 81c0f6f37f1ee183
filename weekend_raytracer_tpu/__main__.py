"""``python -m weekend_raytracer_tpu`` runs the headless render CLI."""
import sys

from .cli import main

sys.exit(main())
