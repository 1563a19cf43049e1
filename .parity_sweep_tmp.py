from graph_database_application_for_recommendations_spark.session import get_spark
from graph_database_application_for_recommendations_spark import registry
from tests.oracle_utils import compare
spark = get_spark('verify', 16); spark.sparkContext.setLogLevel('ERROR')
ok = err = 0
names = sorted(registry.oracle_sql())
for name in names:
    try:
        compare(name, registry.queries()[name](spark,'/root/testdata/sf0.01'),
                registry.oracle_sql()[name], '/root/testdata/sf0.01')
        ok += 1
        print(name, 'OK', flush=True)
    except Exception as e:
        err += 1
        print(name, 'FAIL', str(e)[:300], flush=True)
print('DONE ok=', ok, 'err=', err, flush=True)
