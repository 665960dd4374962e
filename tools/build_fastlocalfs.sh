#!/bin/sh
# Rebuild maha_spark/jvm/maha-fastlocalfs.jar from source (requires a JDK;
# the jar is committed so runtime hosts only need a JRE). Compiled against
# the hadoop-client-api jar PySpark ships — the only compile-time dep.
set -e
REPO="$(cd "$(dirname "$0")/.." && pwd)"
SRC="$REPO/maha_spark/jvm/src"
OUT="$REPO/maha_spark/jvm/classes"
HADOOP_JAR=$(python - <<'EOF'
import glob, os, pyspark
print(glob.glob(os.path.join(os.path.dirname(pyspark.__file__),
                             "jars", "hadoop-client-api-*.jar"))[0])
EOF
)
rm -rf "$OUT" && mkdir -p "$OUT"
javac -encoding UTF-8 --release 17 -cp "$HADOOP_JAR" -d "$OUT" \
    "$SRC"/mahaspark/fs/*.java
jar cf "$REPO/maha_spark/jvm/maha-fastlocalfs.jar" -C "$OUT" mahaspark
rm -rf "$OUT"
echo "built $REPO/maha_spark/jvm/maha-fastlocalfs.jar"
