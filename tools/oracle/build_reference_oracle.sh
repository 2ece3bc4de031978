#!/bin/bash
# Build the reference `mods` binary in THIS environment as a parity
# oracle.  The README golden numbers (74 tentatives / 21 inliers) depend
# on the original authors' OpenCV/FLANN build; the binary produced here
# is the apples-to-apples target for our golden tests (it reports
# 69 tentatives / 22 inliers on graf1<->graf6 with OpenCV 4.6).
#
# The reference tree is copied to /tmp (never modified in place); the
# only patches are build plumbing:
#   - no Fortran compiler       -> disable enable_language(Fortran),
#     point LAPACK_LIBRARIES at the system .so.3 files
#   - -fcommon                  -> legacy C tentative definitions
#   - no cppzmq/zmq.h headers   -> tools/oracle/zmq.hpp, a minimal
#     functional cppzmq replacement over the libzmq.so.5 C ABI
set -e
SRC=/tmp/refsrc
BUILD=/tmp/refbuild
HERE=$(cd "$(dirname "$0")" && pwd)

rm -rf "$SRC" "$BUILD"
cp -r /root/reference "$SRC"
sed -i 's/^enable_language (Fortran)/#enable_language (Fortran)/' "$SRC/CMakeLists.txt"
sed -i 's|FIND_PACKAGE(LAPACK REQUIRED)|set(LAPACK_FOUND TRUE)\nset(LAPACK_LIBRARIES "/lib/x86_64-linux-gnu/liblapack.so.3;/lib/x86_64-linux-gnu/libblas.so.3")|' "$SRC/CMakeLists.txt"
sed -i 's/TARGET_LINK_LIBRARIES(mods  inih  synth-detection mser affinedetectors ${OpenCV_LIBS} cppzmq cnpy  )/TARGET_LINK_LIBRARIES(mods  inih  synth-detection mser affinedetectors ${OpenCV_LIBS} cnpy ${LAPACK_LIBRARIES} )/' "$SRC/CMakeLists.txt"
cp "$HERE/zmq.hpp" "$SRC/zmq.hpp"

mkdir -p "$BUILD"
cd "$BUILD"
cmake "$SRC" -DCMAKE_BUILD_TYPE=Release -DCMAKE_C_FLAGS="-fcommon -O2" \
  -DCMAKE_CXX_STANDARD_LIBRARIES="/lib/x86_64-linux-gnu/liblapack.so.3 /lib/x86_64-linux-gnu/libblas.so.3 /lib/x86_64-linux-gnu/libzmq.so.5" \
  > cmake.log 2>&1
make -j8 mods > make.log 2>&1
echo "oracle binary: $BUILD/mods"
