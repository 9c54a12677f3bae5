from . import graph_objects
