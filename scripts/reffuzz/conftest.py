import sys, types, importlib.util

flask = types.ModuleType('flask')
class _Dummy:
    def __init__(self, *a, **k): pass
    def __call__(self, *a, **k): return self
    def __getattr__(self, n): return _Dummy()
flask.Flask = _Dummy
flask.request = _Dummy()
flask.current_app = _Dummy()
flask.config = types.ModuleType('flask.config'); flask.config.Config = dict
sys.modules['flask'] = flask
sys.modules['flask.config'] = flask.config
for name in ('pattern', 'pattern.en', 'user_agents'):
    sys.modules[name] = types.ModuleType(name)
sys.modules['pattern'].en = sys.modules['pattern.en']

sys.path.insert(0, '/root/repo')
from osm_wikidata_spark.text import numwords, translit

n2w = types.ModuleType('num2words')
def num2words(n, to='cardinal'):
    return numwords.ordinal(n) if to == 'ordinal' else numwords.cardinal(n)
n2w.num2words = num2words
sys.modules['num2words'] = n2w

ud = types.ModuleType('unidecode')
ud.unidecode = translit.transliterate
sys.modules['unidecode'] = ud

pkg = types.ModuleType('matcher'); pkg.__path__ = ['/root/reference/matcher']
sys.modules['matcher'] = pkg
for mod in ('matcher.utils', 'matcher.match'):
    spec = importlib.util.spec_from_file_location(mod, '/root/reference/matcher/' + mod.split('.')[1] + '.py')
    m = importlib.util.module_from_spec(spec)
    sys.modules[mod] = m
    spec.loader.exec_module(m)
